# Zero-shot FARGAN with same-speaker embedding shuffling
# (reference: config/fargan-zeroshot-shuffle.py)
MODULE = 'promonet_tpu'

CONFIG = 'fargan-zeroshot-shuffle'

# The model to use
MODEL = 'fargan'

# Step to start using adversarial loss
ADVERSARIAL_LOSS_START_STEP = 250000

# Training batch size
BATCH_SIZE = 256

# Training sequence length
CHUNK_SIZE = 4096  # samples

# Whether to use mel spectrogram loss
MEL_LOSS = False

# Whether to use multi-resolution spectral convergence loss
SPECTRAL_CONVERGENCE_LOSS = True

# Whether to use WavLM x-vectors for zero-shot speaker conditioning
ZERO_SHOT = True

# Whether to shuffle speaker embeddings during training
ZERO_SHOT_SHUFFLE = True
