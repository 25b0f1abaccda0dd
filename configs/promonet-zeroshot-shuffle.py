# Zero-shot with same-speaker embedding shuffling
# (reference: config/promonet-zeroshot-shuffle.py)
MODULE = 'promonet_tpu'

CONFIG = 'promonet-zeroshot-shuffle'

ZERO_SHOT = True
ZERO_SHOT_SHUFFLE = True
