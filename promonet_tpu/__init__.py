"""promonet_tpu — a TPU-native speech-editing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference system (ProMoNet, "Fine-Grained and Interpretable Neural Speech
Editing", Interspeech 2024): interpretable frame-rate speech features
(multi-band A-weighted loudness, Viterbi-decoded pitch, periodicity,
phonetic posteriorgrams), direct feature editing (pitch shift, time
stretch, loudness scale, spectral balance, voice conversion), and GAN
vocoder resynthesis conditioned on the edited features.

Compute path is pure JAX (jit/pjit/Pallas); training data-parallelizes
over a `jax.sharding.Mesh`. Configuration follows the reference's
"python module overriding constants" pattern (promonet/__init__.py:7-15).
"""

###############################################################################
# Compilation cache
###############################################################################


# Persist compiled XLA programs across processes: model/extractor
# compiles are tens of seconds on TPU, and every CLI entry point is a
# fresh process. TPU-only — CPU AOT artifacts are machine-feature
# specific and can SIGILL when reused across hosts. Opt out with
# PROMONET_TPU_COMPILATION_CACHE=''.
import os as _os

_cache_dir = _os.environ.get(
    'PROMONET_TPU_COMPILATION_CACHE',
    _os.path.expanduser('~/.cache/promonet_tpu/xla'))
_on_cpu = _os.environ.get('JAX_PLATFORMS', '').startswith('cpu')
if _cache_dir and not _on_cpu:
    import jax as _jax
    _jax.config.update('jax_compilation_cache_dir', _cache_dir)
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)


###############################################################################
# Configuration
###############################################################################


# Default configuration parameters to be modified
from .config import defaults

# Modify configuration from --config files / PROMONET_TPU_CONFIG
from .config.core import configure
configure('promonet_tpu', defaults)

# Import configuration parameters
from .config.defaults import *
from .config.static import *


###############################################################################
# Module imports
###############################################################################


from .train import loss, train
from . import adapt
from . import baseline
from . import convert
from . import data
from . import edit
from . import evaluate
from . import load
from . import models
from . import ops
from . import parallel
from . import partition
from . import plot
from . import preprocess
from . import synthesize
from . import utils

# Reference-compatible alias (the reference exposes `promonet.model`)
model = models
