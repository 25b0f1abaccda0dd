"""CLI argument parsing that composes with --config.

Replaces yapecs.ArgumentParser (reference: promonet/preprocess/
__main__.py:14): the package consumed --config at import; the parser
accepts it so subcommand flags compose with configuration files.
"""
import argparse
from pathlib import Path


class ArgumentParser(argparse.ArgumentParser):

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.add_argument(
            '--config',
            type=Path,
            nargs='*',
            help='Python configuration file(s) overriding defaults')

    def parse_args(self, *args, **kwargs):
        namespace = super().parse_args(*args, **kwargs)
        self.config_paths = getattr(namespace, 'config', None) or []
        if hasattr(namespace, 'config'):
            del namespace.config
        return namespace
