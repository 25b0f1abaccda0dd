# Ablation: single-band loudness conditioning
# (reference: config/ablations/ablate-multiloud.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-multiloud'

# Number of bands of A-weighted loudness
LOUDNESS_BANDS = 1
