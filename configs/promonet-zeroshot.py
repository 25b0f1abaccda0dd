# Zero-shot speaker conditioning (reference: config/promonet-zeroshot.py)
MODULE = 'promonet_tpu'

CONFIG = 'promonet-zeroshot'

# Whether to use WavLM x-vectors for zero-shot speaker conditioning
ZERO_SHOT = True
