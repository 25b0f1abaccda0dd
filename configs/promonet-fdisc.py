# HiFi-GAN generator with the FARGAN discriminator
# (reference: config/promonet-fdisc.py)
MODULE = 'promonet_tpu'

CONFIG = 'promonet-fdisc'

COMPLEX_MULTIBAND_DISCRIMINATOR = False
MULTI_PERIOD_DISCRIMINATOR = False
FARGAN_DISCRIMINATOR = True
