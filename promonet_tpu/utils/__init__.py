from . import audio
from . import checkpoint
from . import log
from . import timer
