"""Cooperative trainer-pause protocol (utils/pause.py).

No reference counterpart: the single chip is shared between the long
training run and benchmarking, so benchmarks request exclusive access
instead of measuring contention.
"""
import os
import threading
import time

import promonet_tpu
from promonet_tpu.utils import pause


def _wait(predicate, timeout=5.):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.02)
    return predicate()


def test_pause_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path)

    # No trainer registered: exclusive() is a no-op that reports False
    with pause.exclusive() as acked:
        assert acked is False

    pause.register_trainer()
    assert pause.trainer_alive()

    # maybe_pause without a request is a cheap no-op
    assert pause.maybe_pause() is False

    # Trainer thread parks on the request, acks, and resumes on release
    drained = []
    result = []
    thread = threading.Thread(
        target=lambda: result.append(
            pause.maybe_pause(
                drain=lambda: drained.append(True), poll_seconds=0.02)))
    pause.pause_file().write_text(str(os.getpid()))
    thread.start()
    assert _wait(pause.ack_file().exists)
    assert drained == [True]
    pause.pause_file().unlink()
    thread.join(5.)
    assert result == [True]
    assert not pause.ack_file().exists()
    assert not pause.pause_file().exists()

    pause.unregister_trainer()
    assert not pause.trainer_alive()


def test_exclusive_waits_for_ack(tmp_path, monkeypatch):
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path)
    pause.register_trainer()
    try:
        # The context waits for the trainer's ack before yielding
        def trainer():
            assert _wait(pause.pause_file().exists)
            pause.maybe_pause(poll_seconds=0.02)
        thread = threading.Thread(target=trainer)
        thread.start()
        with pause.exclusive(poll_seconds=0.02) as acked:
            assert acked is True
        thread.join(5.)

        # A dead trainer pid does not block the benchmark
        pause.pid_file().write_text('999999999')
        start = time.time()
        with pause.exclusive(timeout=0.2, poll_seconds=0.02) as acked:
            assert acked is False
        assert time.time() - start < 2.
    finally:
        pause.unregister_trainer()


def test_stale_pause_is_expired(tmp_path, monkeypatch):
    """A PAUSE left by a SIGKILLed benchmark must not park the trainer

    Regression for the round-3 wedge: the driver timeout SIGKILLs the
    benchmark, the `finally` unlink in pause.exclusive never runs, and
    maybe_pause used to idle forever on the orphaned file.
    """
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path)
    pause.register_trainer()
    try:
        # Dead requester pid: expired on entry, trainer does not pause
        pause.pause_file().write_text('999999999')
        assert pause.maybe_pause(poll_seconds=0.02) is False
        assert not pause.pause_file().exists()

        # Legacy pid-less file: also treated as stale
        pause.pause_file().touch()
        assert pause.maybe_pause(poll_seconds=0.02) is False
        assert not pause.pause_file().exists()
    finally:
        pause.unregister_trainer()


def test_requester_death_releases_paused_trainer(tmp_path, monkeypatch):
    """A trainer already parked on a pause resumes when the owner dies"""
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path)
    pause.register_trainer()
    try:
        # Stand in for the benchmark with a real short-lived process so
        # the pid is live at pause time and dead shortly after
        import subprocess
        proc = subprocess.Popen(['sleep', '0.3'])
        pause.pause_file().write_text(str(proc.pid))

        result = []
        thread = threading.Thread(
            target=lambda: result.append(
                pause.maybe_pause(poll_seconds=0.02)))
        thread.start()
        assert _wait(pause.ack_file().exists)
        proc.wait()
        thread.join(5.)
        assert result == [True]
        assert not pause.pause_file().exists()
        assert not pause.ack_file().exists()
    finally:
        pause.unregister_trainer()
