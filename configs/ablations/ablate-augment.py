# Ablate augmentation (reference: config/ablations/ablate-augment.py)
MODULE = 'promonet_tpu'

CONFIG = 'ablate-augment'

AUGMENT_LOUDNESS = False
AUGMENT_PITCH = False
