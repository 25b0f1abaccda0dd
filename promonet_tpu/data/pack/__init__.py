from .core import *
from . import core
