#!/bin/bash
# Supervise the flagship trainer with a wedge watchdog.
#
# Failure mode this exists for: the tunneled TPU attachment can drop
# mid-dispatch, leaving the trainer blocked forever inside
# `jax.device_get` — the process sleeps with ~zero CPU accrual and the
# retry loop in train_flagship.sh never fires because the process
# never exits (observed: 70 minutes silent at a fixed step). The
# trainer touches runs/heartbeat once per dispatch (~10 s apart) and
# while idling in a cooperative pause; this watchdog kills the trainer
# when the heartbeat is stale AND the process is burning no CPU. A
# long cold XLA compile pins a full host core, so the CPU check keeps
# compiles (up to several hundred seconds) from being killed.
#
# Usage: nohup bash scripts/supervise_flagship.sh >> runs/supervisor.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

STALE_SECONDS=${STALE_SECONDS:-600}
CPU_TICKS_ACTIVE=${CPU_TICKS_ACTIVE:-60}   # >0.6 s CPU per minute = alive
HEARTBEAT=runs/heartbeat
PIDFILE=runs/trainer.pid

bash scripts/train_flagship.sh >> runs/flagship.log 2>&1 &
LOOP_PID=$!
echo "[supervisor] launcher pid $LOOP_PID"

prev_cpu=0
prev_pid=0
while kill -0 "$LOOP_PID" 2>/dev/null; do
    sleep 60
    pid=$(cat "$PIDFILE" 2>/dev/null)
    [ -z "$pid" ] && continue
    stat=$(cat "/proc/$pid/stat" 2>/dev/null) || continue
    # utime+stime are fields 14+15; comm (field 2) never contains
    # spaces here (it is 'python')
    cpu=$(echo "$stat" | awk '{print $14 + $15}')
    if [ "$pid" != "$prev_pid" ]; then
        prev_pid=$pid
        prev_cpu=$cpu
        continue
    fi
    dcpu=$((cpu - prev_cpu))
    prev_cpu=$cpu
    now=$(date +%s)
    hb=$(stat -c %Y "$HEARTBEAT" 2>/dev/null || echo 0)
    age=$((now - hb))
    if [ "$age" -gt "$STALE_SECONDS" ] && [ "$dcpu" -lt "$CPU_TICKS_ACTIVE" ]; then
        echo "[supervisor] $(date -u +%FT%TZ) trainer $pid wedged:" \
             "heartbeat ${age}s stale, ${dcpu} cpu ticks/min — killing"
        kill -9 "$pid" 2>/dev/null
        rm -f "$PIDFILE"
    fi
done
echo "[supervisor] launcher exited"
