from . import grid
from . import mel
from . import sparse
from . import spectral
from . import stft
from . import viterbi
from .stft import frame, hann_window, istft
from .spectral import (
    a_weighting,
    amplitude_to_db,
    fft_frequencies,
    power_to_db)
from .mel import linear_to_mel, mel_filterbank
from .sparse import jensen_shannon, sparsify
