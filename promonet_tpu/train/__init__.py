from . import loss
from .core import (
    build_optimizer,
    create_state,
    example_batch,
    generator_args,
    generator_module,
    load_checkpoint,
    make_train_step,
    previous_samples_of,
    save_checkpoint,
    train)
