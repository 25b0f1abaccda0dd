# Default configuration (reference: config/promonet.py)
MODULE = 'promonet_tpu'

# Configuration name
CONFIG = 'promonet'
