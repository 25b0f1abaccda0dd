# FARGAN with late adversarial warmup and a low learning rate
# (reference: config/fargan-advlr1e6-warmup.py)
MODULE = 'promonet_tpu'

CONFIG = 'fargan-advlr1e6-warmup'

# The model to use
MODEL = 'fargan'

# Step to start using adversarial loss
ADVERSARIAL_LOSS_START_STEP = 270000

# Step to start training discriminator
DISCRIMINATOR_START_STEP = 240000

# Training batch size
BATCH_SIZE = 128

# Training sequence length
CHUNK_SIZE = 16384  # samples

# Whether to use mel spectrogram loss
MEL_LOSS = False

# Training optimizer (reference overrides the AdamW betas and lr)
OPTIMIZER = {
    'name': 'adamw',
    'lr': 2e-6,
    'b1': .9,
    'b2': .999,
    'eps': 1e-9}

# Whether to use multi-resolution spectral convergence loss
SPECTRAL_CONVERGENCE_LOSS = True
