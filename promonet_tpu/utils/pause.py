"""Cooperative trainer pause for exclusive device access.

The attachment is one TPU chip shared by every process on this host. A
long training run dispatches continuously, so any benchmark started
alongside it measures contention, not capability (round 2 recorded
41x with the trainer loaded vs 90x solo). Rather than killing the
trainer (which can wedge the chip mid-dispatch), benchmarking asks it
to pause: the trainer polls a PAUSE file between dispatches, drains its
in-flight work, acknowledges, and idles until released.

No reference counterpart (the reference is single-process per GPU).

Protocol files (under RUNS_DIR):
    trainer.pid  — written by the trainer at startup, removed at exit
    PAUSE        — created by a benchmark to request exclusive access;
                   contains the requester's pid so the trainer can
                   expire requests whose owner died without cleanup
                   (e.g. the driver SIGKILLing a timed-out benchmark —
                   the `finally` unlink never runs, and without the
                   liveness check the trainer would park forever)
    PAUSE.ack    — created by the trainer once drained and idle
"""
import contextlib
import os
import time

import promonet_tpu


def _runs_dir():
    promonet_tpu.RUNS_DIR.mkdir(parents=True, exist_ok=True)
    return promonet_tpu.RUNS_DIR


def pause_file():
    return _runs_dir() / 'PAUSE'


def ack_file():
    return _runs_dir() / 'PAUSE.ack'


def pid_file():
    return _runs_dir() / 'trainer.pid'


def heartbeat_file():
    return _runs_dir() / 'heartbeat'


def heartbeat():
    """Touch the liveness file the watchdog monitors.

    The tunneled TPU attachment can drop mid-dispatch, leaving the
    client blocked forever inside `jax.device_get` with zero CPU
    accrual (observed: 70 min silent at a fixed step). The trainer
    touches this file once per dispatch and while idling in a pause;
    `scripts/supervise_flagship.sh` kills the trainer when the file
    goes stale AND the process burns no CPU (a long XLA compile burns
    a full core, so it never false-positives).
    """
    heartbeat_file().touch()


###############################################################################
# Trainer side
###############################################################################


def register_trainer():
    """Record this process as the active trainer"""
    pid_file().write_text(str(os.getpid()))


def unregister_trainer():
    for path in (pid_file(), ack_file()):
        try:
            path.unlink()
        except FileNotFoundError:
            pass


def _pause_requester_alive():
    """Whether the process that created PAUSE is still running.

    A PAUSE file with no parseable pid (legacy empty file) or a dead
    owner is stale — the requester was killed before its cleanup ran —
    and must not park the trainer.
    """
    try:
        pid = int(pause_file().read_text())
    except (FileNotFoundError, ValueError):
        return False
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    return True


def _expire_stale_pause():
    try:
        pause_file().unlink()
    except FileNotFoundError:
        pass


def maybe_pause(drain=None, poll_seconds=1., on_pause=None):
    """If a pause is requested, drain in-flight work and idle until released

    Called once per dispatch in the train loop. `drain` materializes any
    enqueued device work so the chip is genuinely idle while paused.
    `on_pause` runs after the drain and before the acknowledgement — the
    trainer checkpoints there, so if the shared attachment wedges while
    another client hammers the chip (the benchmark's failure mode is
    also the trainer's), no steps are lost. Requests whose owner process
    has died are expired rather than honored, both on entry and while
    idling.
    """
    if not pause_file().exists():
        return False
    if not _pause_requester_alive():
        _expire_stale_pause()
        return False
    if drain is not None:
        drain()
    if on_pause is not None:
        on_pause()
    ack_file().touch()
    try:
        while pause_file().exists():
            if not _pause_requester_alive():
                _expire_stale_pause()
                break
            heartbeat()
            time.sleep(poll_seconds)
    finally:
        try:
            ack_file().unlink()
        except FileNotFoundError:
            pass
    return True


###############################################################################
# Benchmark side
###############################################################################


def trainer_alive():
    try:
        pid = int(pid_file().read_text())
    except (FileNotFoundError, ValueError):
        return False
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    return True


@contextlib.contextmanager
def exclusive(timeout=600., poll_seconds=0.5):
    """Request exclusive device access for the duration of the block

    If a live trainer is registered, ask it to pause and wait (up to
    `timeout` seconds — it may be mid-dispatch or inside a validation
    pass; the 50-step fused dispatch alone holds the chip ~25 s) for
    the acknowledgement before yielding. Always releases on exit.
    Yields True only once the trainer has drained and acknowledged;
    a False yield means measurements may be contended.
    """
    if not trainer_alive():
        yield False
        return
    pause_file().write_text(str(os.getpid()))
    try:
        deadline = time.time() + timeout
        while (time.time() < deadline
               and not ack_file().exists()
               and trainer_alive()):
            time.sleep(poll_seconds)
        acked = ack_file().exists()
        if not acked and trainer_alive():
            import sys
            print(
                'pause.exclusive: trainer did not acknowledge within '
                f'{timeout:.0f}s; measurements may be contended',
                file=sys.stderr)
        yield acked
    finally:
        try:
            pause_file().unlink()
        except FileNotFoundError:
            pass
