"""Generator: feature preparation + speaker conditioning + backbone.

TPU re-design of the reference generator (promonet/model/generator.py).
Public tensor layouts match the reference API — features in (B, C, T) —
and are transposed once to the TPU-native (B, T, C) at the model boundary.
The whole feature-preparation graph (PPG sparsify, variable-bin pitch
lookup, loudness band-average) is jittable and fuses with the backbone
into a single XLA program.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

import promonet_tpu
from ..ops import sparse
from .hifigan import HiFiGAN
from .vocos import Vocos
from .fargan import FARGAN


def _band_average(loudness, bands):
    """Average full-band loudness (B, F, T) into `bands` bands

    Reference: promonet/preprocess/loudness.py:84-111 (uneven final band
    when F % bands != 0, matching int-truncation slicing).
    """
    num_freqs = loudness.shape[-2]
    step = num_freqs / bands
    slices = [
        loudness[..., int(band * step):int((band + 1) * step), :].mean(
            axis=-2)
        for band in range(bands)]
    return jnp.stack(slices, axis=-2)


def _normalize_loudness(loudness):
    """Normalize loudness to [-1, 1] (promonet/preprocess/loudness.py:144-146)"""
    return (
        (loudness - promonet_tpu.MIN_DB) /
        (promonet_tpu.REF_DB - promonet_tpu.MIN_DB))


class BaseGenerator(nn.Module):
    """Backbone selection + speaker embedding (promonet/model/generator.py:12-77)"""

    model: str
    num_features: int
    global_channels: int
    num_speakers: int
    speaker_channels: int
    zero_shot: bool
    augment_pitch: bool
    augment_loudness: bool
    remat: bool = False
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.model == 'hifigan':
            self.backbone = HiFiGAN(
                initial_size=promonet_tpu.HIFIGAN_UPSAMPLE_INITIAL_SIZE,
                upsample_kernel_sizes=tuple(
                    promonet_tpu.HIFIGAN_UPSAMPLE_KERNEL_SIZES),
                upsample_rates=tuple(promonet_tpu.HIFIGAN_UPSAMPLE_RATES),
                resblock_kernel_sizes=tuple(
                    promonet_tpu.HIFIGAN_RESBLOCK_KERNEL_SIZES),
                resblock_dilation_sizes=tuple(
                    tuple(d) for d in
                    promonet_tpu.HIFIGAN_RESBLOCK_DILATION_SIZES),
                lrelu_slope=promonet_tpu.LRELU_SLOPE,
                remat=self.remat,
                pallas=self.pallas,
                dtype=self.dtype)
        elif self.model == 'vocos':
            self.backbone = Vocos(
                channels=promonet_tpu.VOCOS_CHANNELS,
                pointwise_channels=promonet_tpu.VOCOS_POINTWISE_CHANNELS,
                num_layers=promonet_tpu.VOCOS_LAYERS,
                n_fft=promonet_tpu.NUM_FFT,
                hop_length=promonet_tpu.HOPSIZE,
                dtype=self.dtype)
        elif self.model == 'fargan':
            self.backbone = FARGAN(dtype=self.dtype)
        else:
            raise ValueError(f'Generator model {self.model} is not defined')

        if self.zero_shot:
            self.speaker_embedding = nn.Dense(
                self.speaker_channels, dtype=self.dtype)
        else:
            self.speaker_embedding = nn.Embed(
                self.num_speakers,
                self.speaker_channels,
                embedding_init=nn.initializers.normal(1.0))

    def prepare_global_features(
        self,
        speakers,
        spectral_balance_ratios,
        loudness_ratios
    ):
        """Speaker embedding ⊕ augmentation ratios, shape (B, 1, G)

        Reference: promonet/model/generator.py:49-70.
        """
        global_features = self.speaker_embedding(speakers)[:, None, :]
        if self.augment_pitch:
            global_features = jnp.concatenate(
                (global_features, spectral_balance_ratios[:, None, None]),
                axis=-1)
        if self.augment_loudness:
            global_features = jnp.concatenate(
                (global_features, loudness_ratios[:, None, None]),
                axis=-1)
        return global_features.astype(self.dtype)


class Generator(BaseGenerator):
    """Proposed generator over interpretable features

    Reference: promonet/model/generator.py:85-197. `pitch_distribution` is
    a static tuple of PITCH_BINS variable-bin boundaries in Hz.
    """

    pitch_distribution: Optional[Tuple[float, ...]] = None
    input_features: Tuple[str, ...] = ('loudness', 'pitch', 'periodicity', 'ppg')
    pitch_embedding: bool = True
    variable_pitch_bins: bool = True
    pitch_bins: int = 256
    pitch_embedding_size: int = 64
    loudness_bands: int = 8
    sparse_ppg_method: Optional[str] = 'percentile'
    sparse_ppg_threshold: float = 0.85

    @classmethod
    def create(cls, dtype=None, remat=False):
        """Construct from the active configuration"""
        import promonet_tpu.load
        if dtype is None:
            dtype = (
                jnp.bfloat16 if promonet_tpu.PRECISION == 'bfloat16'
                else jnp.float32)
        pallas = promonet_tpu.PALLAS_RESBLOCK
        if pallas is None:
            import jax
            pallas = jax.default_backend() == 'tpu'
        distribution = None
        if promonet_tpu.VARIABLE_PITCH_BINS:
            distribution = tuple(
                float(x) for x in promonet_tpu.load.pitch_distribution())
        return cls(
            model=promonet_tpu.MODEL,
            num_features=promonet_tpu.NUM_FEATURES,
            global_channels=promonet_tpu.GLOBAL_CHANNELS,
            num_speakers=promonet_tpu.NUM_SPEAKERS,
            speaker_channels=promonet_tpu.SPEAKER_CHANNELS,
            zero_shot=promonet_tpu.ZERO_SHOT,
            augment_pitch=promonet_tpu.AUGMENT_PITCH,
            augment_loudness=promonet_tpu.AUGMENT_LOUDNESS,
            pitch_distribution=distribution,
            input_features=tuple(promonet_tpu.INPUT_FEATURES),
            pitch_embedding=promonet_tpu.PITCH_EMBEDDING,
            variable_pitch_bins=promonet_tpu.VARIABLE_PITCH_BINS,
            pitch_bins=promonet_tpu.PITCH_BINS,
            pitch_embedding_size=promonet_tpu.PITCH_EMBEDDING_SIZE,
            loudness_bands=promonet_tpu.LOUDNESS_BANDS,
            sparse_ppg_method=promonet_tpu.SPARSE_PPG_METHOD,
            sparse_ppg_threshold=promonet_tpu.SPARSE_PPG_THRESHOLD,
            remat=remat,
            pallas=pallas,
            dtype=dtype)

    def setup(self):
        super().setup()
        if 'pitch' in self.input_features and self.pitch_embedding:
            self.pitch_embed = nn.Embed(
                self.pitch_bins,
                self.pitch_embedding_size,
                embedding_init=nn.initializers.normal(1.0))

    def __call__(
        self,
        loudness,
        pitch,
        periodicity,
        ppg,
        speakers,
        spectral_balance_ratios,
        loudness_ratios,
        previous_samples=None,
        train=False,
        initial_states=None,
        return_states=False
    ):
        """
        Arguments (reference layouts, promonet/model/generator.py:116-135)
            loudness: (B, F, T) full-band A-weighted loudness
            pitch: (B, T) pitch in Hz
            periodicity: (B, T)
            ppg: (B, PPG_CHANNELS, T)
            speakers: (B,) int speaker ids, or (B, 512) WavLM x-vectors
            spectral_balance_ratios: (B,)
            loudness_ratios: (B,)
            previous_samples: (B, 1, NUM_PREVIOUS_SAMPLES) for AR models
            initial_states / return_states: FARGAN exact-state streaming
                continuation (models/fargan.py)

        Returns
            audio: (B, 1, T * HOPSIZE) [, final recurrent states]
        """
        features = self.prepare_features(loudness, pitch, periodicity, ppg)
        global_features = self.prepare_global_features(
            speakers, spectral_balance_ratios, loudness_ratios)
        if self.model == 'fargan':
            out = self.backbone(
                features,
                global_features,
                previous_samples,
                train=train,
                initial_states=initial_states,
                return_states=return_states)
            if return_states:
                audio, states = out
                return jnp.swapaxes(audio, -1, -2), states
            return jnp.swapaxes(out, -1, -2)
        audio = self.backbone(
            features, global_features, previous_samples, train=train)
        # (B, T_audio, 1) -> (B, 1, T_audio)
        return jnp.swapaxes(audio, -1, -2)

    def prepare_features(self, loudness, pitch, periodicity, ppg):
        """Assemble (B, T, NUM_FEATURES) network input

        Reference: promonet/model/generator.py:137-197.
        """
        # Maybe sparsify PPGs
        if self.sparse_ppg_method is not None:
            ppg = sparse.sparsify(
                ppg, self.sparse_ppg_method, self.sparse_ppg_threshold)
        columns = [jnp.swapaxes(ppg, -1, -2)]  # (B, T, C)

        # Maybe add pitch features
        if 'pitch' in self.input_features:
            hz = jnp.clip(pitch, promonet_tpu.FMIN, promonet_tpu.FMAX)
            if self.pitch_embedding:
                if self.variable_pitch_bins:
                    distribution = jnp.asarray(
                        self.pitch_distribution, dtype=jnp.float32)
                    bins = jnp.searchsorted(distribution, hz)
                    bins = jnp.clip(bins, 0, self.pitch_bins - 1)
                else:
                    normalized = (
                        (jnp.log2(hz) - promonet_tpu.LOG_FMIN) /
                        (promonet_tpu.LOG_FMAX - promonet_tpu.LOG_FMIN))
                    bins = ((self.pitch_bins - 1) * normalized).astype(
                        jnp.int32)
                columns.append(self.pitch_embed(bins))  # (B, T, 64)
            else:
                normalized = (
                    (jnp.log2(hz) - promonet_tpu.LOG_FMIN) /
                    (promonet_tpu.LOG_FMAX - promonet_tpu.LOG_FMIN))
                columns.append(normalized[..., None])

        # Maybe add loudness features
        if 'loudness' in self.input_features:
            averaged = _band_average(loudness, self.loudness_bands)
            normalized = _normalize_loudness(averaged)
            columns.append(jnp.swapaxes(normalized, -1, -2))  # (B, T, bands)

        # Maybe add periodicity features
        if 'periodicity' in self.input_features:
            columns.append(periodicity[..., None])

        # Append period for FARGAN pitch lookup
        if self.model == 'fargan':
            period = (
                promonet_tpu.SAMPLE_RATE /
                jnp.clip(pitch, promonet_tpu.FMIN, promonet_tpu.FMAX))
            columns.append(period[..., None])

        return jnp.concatenate(
            [c.astype(self.dtype) for c in columns], axis=-1)


class MelGenerator(BaseGenerator):
    """Generate speech from Mel spectrograms

    Reference: promonet/model/generator.py:430-463.
    """

    sparse_mels: bool = False

    @classmethod
    def create(cls, dtype=None, remat=False):
        if dtype is None:
            dtype = (
                jnp.bfloat16 if promonet_tpu.PRECISION == 'bfloat16'
                else jnp.float32)
        pallas = promonet_tpu.PALLAS_RESBLOCK
        if pallas is None:
            import jax
            pallas = jax.default_backend() == 'tpu'
        return cls(
            model=promonet_tpu.MODEL,
            num_features=promonet_tpu.NUM_MELS,
            global_channels=promonet_tpu.GLOBAL_CHANNELS,
            num_speakers=promonet_tpu.NUM_SPEAKERS,
            speaker_channels=promonet_tpu.SPEAKER_CHANNELS,
            zero_shot=promonet_tpu.ZERO_SHOT,
            augment_pitch=promonet_tpu.AUGMENT_PITCH,
            augment_loudness=promonet_tpu.AUGMENT_LOUDNESS,
            sparse_mels=promonet_tpu.SPARSE_MELS,
            remat=remat,
            pallas=pallas,
            dtype=dtype)

    def __call__(
        self,
        spectrograms,
        speakers,
        spectral_balance_ratios,
        loudness_ratios,
        previous_samples=None,
        train=False
    ):
        features = self.prepare_features(spectrograms)
        global_features = self.prepare_global_features(
            speakers, spectral_balance_ratios, loudness_ratios)
        audio = self.backbone(
            features, global_features, previous_samples, train=train)
        return jnp.swapaxes(audio, -1, -2)

    def prepare_features(self, spectrograms):
        """Linear spectrogram (B, F, T) → log-mel (B, T, NUM_MELS)"""
        from ..ops import mel as mel_ops
        features = mel_ops.linear_to_mel(
            spectrograms,
            promonet_tpu.SAMPLE_RATE,
            promonet_tpu.NUM_FFT,
            promonet_tpu.NUM_MELS,
            promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD)
        if self.sparse_mels:
            features = (
                features + promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD)
        return jnp.swapaxes(features, -1, -2).astype(self.dtype)
