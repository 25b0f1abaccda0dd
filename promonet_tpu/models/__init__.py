from . import core
from . import modules
from .cargan import CARGAN, Autoregressive
from .core import get_padding, random_slice_segments, slice_segments
from .discriminator import (
    Discriminator,
    DiscriminatorCMB,
    DiscriminatorMagFree,
    DiscriminatorP,
    DiscriminatorR,
    DiscriminatorS)
from .fargan import FARGAN
from .generator import Generator, MelGenerator
from .hifigan import HiFiGAN
from .vocos import Vocos
from . import export
