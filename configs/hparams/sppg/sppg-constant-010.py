# Sparse-PPG constant-threshold sweep
# (reference: config/hparams/sppg/sppg-constant-010.py)
MODULE = 'promonet_tpu'

CONFIG = 'sppg-constant-010'

SPARSE_PPG_METHOD = 'constant'
SPARSE_PPG_THRESHOLD = 0.10
