# Sparse-PPG top-k sweep (reference: config/hparams/sppg/sppg-top-6.py)
MODULE = 'promonet_tpu'

CONFIG = 'sppg-top-6'

SPARSE_PPG_METHOD = 'topk'
SPARSE_PPG_THRESHOLD = 6
