"""Zero-egress training run on the formant-synthesis corpus.

Reference training budget (promonet/config/defaults.py:361-394) on the
in-repo corpus (promonet_tpu/data/synthetic.py) — the environment has
no network access, so DAPS/LibriTTS/VCTK cannot be downloaded.
Evaluation/checkpoint cadence is thinned to keep the 800k-step run
wall-clock dominated by the jitted train step.
"""
MODULE = 'promonet'

TRAINING_DATASET = 'synthetic'

# In-train evaluation cadence (reference: 2500 / 16 / 10 at
# promonet/config/defaults.py:292-307): thinned for the long run —
# each eval synchronizes the dispatch pipeline and host-loads
# validation utterances over the (narrow) attachment
EVALUATION_INTERVAL = 50000
DEFAULT_EVALUATION_STEPS = 4
PLOT_EXAMPLES = 2

# 500 optimizer steps per compiled dispatch: measured per-dispatch
# latency on this tunneled attachment is seconds; at K=500 it fully
# overlaps device execution (depth-2 pipeline in the train loop)
STEPS_PER_DISPATCH = 500

# Checkpoint cadence (reference: 20000) thinned to bound disk use
CHECKPOINT_INTERVAL = 100000
