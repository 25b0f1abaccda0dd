# Ablate all proposals (reference: config/ablations/ablate-all.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-all'

AUGMENT_LOUDNESS = False
AUGMENT_PITCH = False
SPARSE_PPG_METHOD = None
VARIABLE_PITCH_BINS = False
VITERBI_DECODE_PITCH = False
