# Sparse-PPG top-k sweep (reference: config/hparams/sppg/sppg-top-5.py)
MODULE = 'promonet_tpu'

CONFIG = 'sppg-top-5'

SPARSE_PPG_METHOD = 'topk'
SPARSE_PPG_THRESHOLD = 5
