from . import core
from . import defaults
