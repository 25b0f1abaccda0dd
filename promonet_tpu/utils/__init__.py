from . import audio
from . import checkpoint
from . import cli
from . import log
from . import notify
from . import pause
from . import timer
