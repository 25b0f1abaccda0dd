"""Config composition.

Reimplements the yapecs pattern used by the reference
(promonet/__init__.py:7-15; config files are plain Python modules declaring
``MODULE = '<package>'`` plus overridden UPPERCASE constants). Resolution is
two-stage: ``defaults.py`` (user-overridable) is patched in place, then
``static.py`` computes derived values from the merged result.

Config sources, in priority order:
    1. ``--config <file.py> [<file2.py> ...]`` on the command line
    2. the ``PROMONET_TPU_CONFIG`` environment variable (path list, ':'-sep)
"""
import importlib.util
import os
import sys
from pathlib import Path


def config_paths_from_argv(argv=None):
    """Extract --config arguments without disturbing other CLI parsing"""
    argv = sys.argv if argv is None else argv
    paths = []
    if '--config' in argv:
        start = argv.index('--config') + 1
        for arg in argv[start:]:
            if arg.startswith('-'):
                break
            paths.append(arg)
    return paths


def load_config_module(path):
    """Execute a Python config file and return the resulting module"""
    path = Path(path)
    spec = importlib.util.spec_from_file_location(path.stem, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def configure(module_name, defaults, paths=None):
    """Merge user config files onto the defaults module (in place)"""
    if paths is None:
        paths = config_paths_from_argv()
        env = os.environ.get('PROMONET_TPU_CONFIG')
        if not paths and env:
            paths = [p for p in env.split(':') if p]

    for path in paths:
        user = load_config_module(path)

        # Config files declare which package they configure; accept both the
        # TPU package name and the reference's name so reference experiment
        # configs work unmodified
        target = getattr(user, 'MODULE', None)
        if target not in (module_name, 'promonet'):
            continue

        for name in dir(user):
            if name.isupper() and name != 'MODULE':
                setattr(defaults, name, getattr(user, name))

    return defaults
