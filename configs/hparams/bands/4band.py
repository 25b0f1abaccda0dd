# Loudness band sweep (reference: config/hparams/bands/4band.py)
MODULE = 'promonet_tpu'

CONFIG = '4band'

LOUDNESS_BANDS = 4
