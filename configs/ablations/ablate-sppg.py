# Ablate sparse PPGs (reference: config/ablations/ablate-sppg.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-sppg'

SPARSE_PPG_METHOD = None
