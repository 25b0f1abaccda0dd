"""ctypes binding for the native data-loading runtime.

The C++ library (native/promonet_io.cpp) decodes WAV chunks and
assembles training batches off the GIL with its own thread pool —
the role the reference delegates to torch DataLoader's C++ workers
(promonet/data/loader.py:17-22). Built on first use with g++; all
callers fall back to the pure-Python path when unavailable.
"""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SOURCE = Path(__file__).parent.parent.parent / 'native' / 'promonet_io.cpp'
_LIBRARY = _SOURCE.with_suffix('.so')


def _build():
    subprocess.run(
        [
            'g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
            str(_SOURCE), '-o', str(_LIBRARY)
        ],
        check=True,
        capture_output=True)


def library():
    """Load (building if needed) the native library; None if unavailable"""
    if not hasattr(library, 'cache'):
        try:
            if not _LIBRARY.exists() or (
                _SOURCE.stat().st_mtime > _LIBRARY.stat().st_mtime
            ):
                _build()
            lib = ctypes.CDLL(str(_LIBRARY))
            lib.promonet_wav_frames.restype = ctypes.c_int64
            lib.promonet_wav_frames.argtypes = [ctypes.c_char_p]
            lib.promonet_wav_chunk.restype = ctypes.c_int64
            lib.promonet_wav_chunk.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            lib.promonet_wav_batch.restype = ctypes.c_int32
            lib.promonet_wav_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32]
            library.cache = lib
        except Exception:
            library.cache = None
    return library.cache


def available():
    return library() is not None


def wav_frames(path):
    """Number of audio frames in a 16-bit PCM wav"""
    return int(library().promonet_wav_frames(str(path).encode()))


def wav_chunk(path, start, count):
    """Decode `count` mono frames starting at `start` (zero-padded)"""
    out = np.empty(count, np.float32)
    got = library().promonet_wav_chunk(
        str(path).encode(),
        int(start),
        int(count),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        raise IOError(f'native wav decode failed: {path}')
    return out


def wav_batch(paths, starts, chunk, threads=8):
    """Decode a batch of chunks in parallel native threads

    Returns (batch, chunk) float32.
    """
    batch = len(paths)
    out = np.empty((batch, chunk), np.float32)
    encoded = [str(p).encode() for p in paths]
    path_array = (ctypes.c_char_p * batch)(*encoded)
    start_array = (ctypes.c_int64 * batch)(*[int(s) for s in starts])
    failures = library().promonet_wav_batch(
        path_array,
        start_array,
        batch,
        int(chunk),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(threads))
    if failures:
        raise IOError(f'native wav batch decode: {failures} failures')
    return out
