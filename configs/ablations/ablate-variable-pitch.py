# Ablate variable-width pitch bins
# (reference: config/ablations/ablate-variable-pitch.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-variable-pitch'

VARIABLE_PITCH_BINS = False
