#!/bin/bash
# Launch/resume the flagship synthetic run (runs/promonet/synthetic.py).
#
# - Warm-starts from the committed release checkpoint when the run dir
#   has no full training checkpoint (host wipes drop the gitignored
#   generator-*/discriminator-* state; the params-only release survives
#   in git). The copy goes through a temp name + atomic mv so an
#   interrupted copy cannot leave a partial checkpoint that satisfies
#   the existence guard on the next launch.
# - Retries on nonzero exit: the tunneled TPU attachment sporadically
#   fails hard at backend init when another client is attaching or
#   detaching ("Backend 'axon' is not in the list of known backends");
#   auto-resume + the persistent compile cache make restarts cheap.
#   Exhausting the retry budget propagates the last failure code.
cd "$(dirname "$0")/.." || exit 1
# APPEND to PYTHONPATH: overwriting it drops the TPU plugin's site dir
# (the axon backend lives on the inherited PYTHONPATH, e.g.
# ~/.axon_site) and every backend init fails with "Backend 'axon' is
# not in the list of known backends"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if ! ls runs/promonet/generator-0* >/dev/null 2>&1; then
    latest=$(ls -d runs/promonet/release/generator-* 2>/dev/null | sort | tail -1)
    if [ -n "$latest" ]; then
        echo "warm-starting from release checkpoint $latest"
        rm -rf runs/promonet/.tmp-warmstart
        cp -r "$latest" runs/promonet/.tmp-warmstart \
            && mv runs/promonet/.tmp-warmstart \
                 "runs/promonet/$(basename "$latest")"
    fi
fi

rc=1
for i in $(seq 1 1000); do
    python -m promonet_tpu.train --config runs/promonet/synthetic.py
    rc=$?
    [ $rc -eq 0 ] && break
    echo "trainer exited rc=$rc; retry $i" >&2
    sleep 15
done
exit $rc
