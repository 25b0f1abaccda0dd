# Loudness band sweep (reference: config/hparams/bands/8band.py)
MODULE = 'promonet_tpu'

CONFIG = '8band'

LOUDNESS_BANDS = 8
