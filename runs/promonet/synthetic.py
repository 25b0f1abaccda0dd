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
# validation utterances over the (narrow) attachment. Round 5: 10k
# (was 50k) so every 10k steps logs a validation reading against the
# corrected corpus; the corrected-corpus baseline is the post-restart
# step-100000 metrics.jsonl entry (periodicity 0.128 / pitch 51.1
# cents / PPG JSD 0.131).
EVALUATION_INTERVAL = 10000
DEFAULT_EVALUATION_STEPS = 4
PLOT_EXAMPLES = 2

# 50 optimizer steps per compiled dispatch: amortizes the per-dispatch
# tunnel latency while keeping each program's runtime ~10 s (very long
# single programs have crashed the attachment's TPU worker)
STEPS_PER_DISPATCH = 50

# Checkpoint cadence (reference: 20000). Round 5: 2500 (was 10000) —
# orbax writes are cheap and the wedge watchdog's kill path previously
# re-trained up to 8k steps after a mid-interval restart.
CHECKPOINT_INTERVAL = 2500

# Step budget. The reference trains 800k steps over days on one GPU
# (promonet/config/defaults.py:381); the HONESTLY-measured GAN step on
# this chip is ~190-260 ms at the reference batch size (bench.py
# train_step; earlier 16.8 ms readings were an async-dispatch artifact
# of block_until_ready on the tunneled attachment), so the budget is
# wall-clock-bound per session. Checkpoints land every 10k steps and
# the run auto-resumes, so raising this continues the same run toward
# the reference budget. Round-3 note: steps before 140k trained with
# the broken augmentation-ratio sampler (89% of pitch augmentations
# beyond 2x); the corrected corpus + regenerated pitch-distribution
# bins apply from 140k on.
STEPS = 800000

# Activations fit single-chip HBM at this model/batch size without
# rematerialization; skipping remat saves the backward recompute
REMAT = False

# The on-disk corpus features (and the released checkpoints' training
# targets) were extracted with the DSP front-end; evaluation compares
# re-extracted generated audio against those stored targets, so this
# run pins the estimator rather than inheriting the 'cnn' default.
PITCH_ESTIMATOR = 'dsp'
