# Loudness band sweep (reference: config/hparams/bands/16band.py)
MODULE = 'promonet_tpu'

CONFIG = '16band'

LOUDNESS_BANDS = 16
