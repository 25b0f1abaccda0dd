"""CLI surface tests: every entry point parses its flags"""
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ENTRY_POINTS = [
    'promonet_tpu.preprocess',
    'promonet_tpu.edit',
    'promonet_tpu.synthesize',
    'promonet_tpu.train',
    'promonet_tpu.adapt',
    'promonet_tpu.evaluate',
    'promonet_tpu.partition',
    'promonet_tpu.plot',
    'promonet_tpu.data.download',
    'promonet_tpu.data.augment',
    'promonet_tpu.data.preprocess',
    'promonet_tpu.data.pack',
    'promonet_tpu.models.export',
]


@pytest.mark.parametrize('module', ENTRY_POINTS)
def test_help(module):
    result = subprocess.run(
        [sys.executable, '-m', module, '--help'],
        capture_output=True,
        text=True,
        timeout=120,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin:/usr/local/bin',
             'HOME': '/root'},
        cwd='/root/repo')
    assert result.returncode == 0, result.stderr[-500:]
    assert 'usage' in result.stdout.lower()
    # --config composes with every subcommand
    assert '--config' in result.stdout
