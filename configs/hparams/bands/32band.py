# Loudness band sweep (reference: config/hparams/bands/32band.py)
MODULE = 'promonet_tpu'

CONFIG = '32band'

LOUDNESS_BANDS = 32
