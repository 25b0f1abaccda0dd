from . import augment
from . import download
from . import pack
from . import preprocess
from . import synthetic
from .collate import collate
from .dataset import Dataset
from .loader import Loader, loader
from .sampler import Sampler
