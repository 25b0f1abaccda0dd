# Sparse-PPG top-k sweep (reference: config/hparams/sppg/sppg-top-3.py)
MODULE = 'promonet_tpu'

CONFIG = 'sppg-top-3'

SPARSE_PPG_METHOD = 'topk'
SPARSE_PPG_THRESHOLD = 3
