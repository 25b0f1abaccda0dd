# Mel-vocoder baseline (reference: config/baselines/mels.py)
MODULE = 'promonet_tpu'

CONFIG = 'mels'

# Only use spectral features
SPECTROGRAM_ONLY = True
