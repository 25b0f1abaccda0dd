# Sparse-PPG top-k sweep (reference: config/hparams/sppg/sppg-top-4.py)
MODULE = 'promonet_tpu'

CONFIG = 'sppg-top-4'

SPARSE_PPG_METHOD = 'topk'
SPARSE_PPG_THRESHOLD = 4
