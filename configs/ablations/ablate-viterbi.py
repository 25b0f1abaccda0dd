# Ablate Viterbi pitch decoding
# (reference: config/ablations/ablate-viterbi.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-viterbi'

VITERBI_DECODE_PITCH = False
