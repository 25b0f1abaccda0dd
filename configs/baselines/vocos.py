# Vocos baseline (reference: config/baselines/vocos.py)
MODULE = 'promonet_tpu'

CONFIG = 'vocos'

MODEL = 'vocos'

# Vocos uses standard AdamW betas
OPTIMIZER = {
    'name': 'adamw',
    'lr': 2e-4,
    'b1': .9,
    'b2': .999,
    'eps': 1e-9,
    'weight_decay': 1e-2}
