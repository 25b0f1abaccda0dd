# WORLD DSP vocoder baseline (reference: config/baselines/world.py)
MODULE = 'promonet_tpu'

CONFIG = 'world'

MODEL = 'world'
