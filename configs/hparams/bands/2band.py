# Loudness band sweep (reference: config/hparams/bands/2band.py)
MODULE = 'promonet_tpu'

CONFIG = '2band'

LOUDNESS_BANDS = 2
