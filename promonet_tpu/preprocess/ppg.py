"""Phonetic posteriorgrams (PPGs).

TPU-native replacement for the external `ppgs` package the reference
depends on (promonet/preprocess/core.py:87-103): a frame-rate categorical
distribution over 40 phonemes.

The encoder is a jittable convolutional network over log-mels. Pretrained
`ppgs` weights can be ported into this architecture via
`load_params`; without a checkpoint the module still provides the full
interface (sparsify/grid/distance live in ops.sparse and ops.grid) so the
end-to-end pipeline runs, and the encoder can be trained from forced
alignments with `promonet_tpu.train`-style supervision.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import promonet_tpu

# 39 CMUdict phonemes + silence (the reference uses ppgs.PHONEMES;
# promonet/config/defaults.py:102 fixes PPG_CHANNELS = 40)
PHONEMES = [
    'aa', 'ae', 'ah', 'ao', 'aw', 'ay', 'b', 'ch', 'd', 'dh',
    'eh', 'er', 'ey', 'f', 'g', 'hh', 'ih', 'iy', 'jh', 'k',
    'l', 'm', 'n', 'ng', 'ow', 'oy', 'p', 'r', 's', 'sh',
    't', 'th', 'uh', 'uw', 'v', 'w', 'y', 'z', 'zh', '<silence>']

PHONEME_TO_INDEX_MAPPING = {p: i for i, p in enumerate(PHONEMES)}

SILENCE = '<silence>'

# Voiced phonemes (vowels, semivowels, nasals, voiced obstruents) — used by
# the PPG-aware time-stretch to exempt frames (promonet/edit/core.py:60-76)
VOICED = [
    'aa', 'ae', 'ah', 'ao', 'aw', 'ay', 'b', 'd', 'dh', 'eh', 'er', 'ey',
    'g', 'ih', 'iy', 'jh', 'l', 'm', 'n', 'ng', 'ow', 'oy', 'r', 'uh',
    'uw', 'v', 'w', 'y', 'z', 'zh']


class PPGEncoder(nn.Module):
    """Frame-rate phoneme classifier over log-mels"""

    channels: int = 256
    num_layers: int = 6
    num_phonemes: int = 40
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mels):
        """mels: (B, T, NUM_MELS) → log-posteriors (B, T, num_phonemes)"""
        x = mels.astype(self.dtype)
        for _ in range(self.num_layers):
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                padding='SAME',
                dtype=self.dtype)(x)
            y = nn.LayerNorm(dtype=self.dtype)(y)
            y = nn.gelu(y)
            x = y if x.shape[-1] != self.channels else x + y
        x = nn.Dense(self.num_phonemes, dtype=self.dtype)(x)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _model():
    if not hasattr(_model, 'cache'):
        module = PPGEncoder(num_phonemes=promonet_tpu.PPG_CHANNELS)
        params = None
        checkpoint = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'ppg'
        if checkpoint.exists():
            params = promonet_tpu.utils.checkpoint.load(checkpoint)['params']
        else:
            # Init must run outside any enclosing trace: the cache holds
            # concrete arrays (a tracer here would leak across jits)
            with jax.ensure_compile_time_eval():
                params = module.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, promonet_tpu.NUM_MELS)))
        _model.cache = (module, params)
    return _model.cache


@functools.partial(jax.jit, static_argnames=())
def _infer(params, mels):
    module = _model()[0]
    return module.apply(params, mels)


def from_audio(audio, sample_rate=None, gpu=None):
    """Compute PPGs from audio (1, T) → (PPG_CHANNELS, frames)"""
    module, params = _model()
    mels = promonet_tpu.preprocess.spectrogram.from_audio(
        jnp.asarray(audio), mels=True)
    log_probs = _infer(params, jnp.swapaxes(mels, -1, -2)[None])
    return jnp.exp(jnp.swapaxes(log_probs[0], -1, -2))


def from_file(audio_file, **kwargs):
    return from_audio(promonet_tpu.load.audio(audio_file), **kwargs)


def from_file_to_file(audio_file, output_file, **kwargs):
    promonet_tpu.load.save_array(
        output_file, np.asarray(from_file(audio_file, **kwargs)))


def from_files_to_files(audio_files, output_files, **kwargs):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, **kwargs)
