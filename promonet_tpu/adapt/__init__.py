from .core import speaker
