# Sparse-PPG percentile sweep
# (reference: config/hparams/sppg/sppg-percentile-080.py)
MODULE = 'promonet_tpu'

CONFIG = 'sppg-percentile-080'

SPARSE_PPG_METHOD = 'percentile'
SPARSE_PPG_THRESHOLD = 0.80
