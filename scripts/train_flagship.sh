#!/bin/bash
# Launch/resume the flagship synthetic run (runs/promonet/synthetic.py).
#
# - Warm-starts from the committed release checkpoint when the run dir
#   has no full training checkpoint (host wipes drop the gitignored
#   generator-*/discriminator-* state; the params-only release survives
#   in git).
# - Retries on nonzero exit: the tunneled TPU attachment sporadically
#   fails hard at backend init when another client is attaching or
#   detaching ("Backend 'axon' is not in the list of known backends");
#   auto-resume + the persistent compile cache make restarts cheap.
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"

if ! ls runs/promonet/generator-0* >/dev/null 2>&1; then
    latest=$(ls -d runs/promonet/release/generator-* 2>/dev/null | sort | tail -1)
    if [ -n "$latest" ]; then
        echo "warm-starting from release checkpoint $latest"
        cp -r "$latest" runs/promonet/
    fi
fi

for i in $(seq 1 60); do
    python -m promonet_tpu.train --config runs/promonet/synthetic.py
    rc=$?
    [ $rc -eq 0 ] && break
    echo "trainer exited rc=$rc; retry $i" >&2
    sleep 15
done
