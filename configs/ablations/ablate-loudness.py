# Ablate multi-band loudness (reference: config/ablations/ablate-loudness.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-loudness'

LOUDNESS_BANDS = 1
