"""Speech harmonic contours F0..Fk.

Reference: promonet/preprocess/harmonics.py. Analysis features come from a
high-passed, band-limited STFT (harmonics.py:363-428); decoding is either
peak-picking or the reference's iterative masked Viterbi
(harmonics.py:215-297), which the reference offloads to the torbi CUDA
extension — here it runs through ops/viterbi.py (scan-based for the large
state space).
"""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.signal

import promonet_tpu
from ..ops import stft as stft_ops, viterbi as viterbi_ops


def from_audio(
    audio,
    sample_rate=None,
    pitch=None,
    features='stft',
    decoder='viterbi',
    max_harmonics=None,
    return_features=False
):
    """Compute speech harmonic contours

    Returns (max_harmonics, frames); NaNs where fewer harmonics exist.
    Reference: promonet/preprocess/harmonics.py:20-76.
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    if max_harmonics is None:
        max_harmonics = promonet_tpu.MAX_HARMONICS

    if features == 'stft':
        frames, frequencies = stft_features(audio, sample_rate)
    elif features == 'lpc':
        frames, frequencies = lpc_coefficients(audio, sample_rate)
    elif features == 'posteriorgram':
        frames, frequencies = pitch_posteriorgram(audio, sample_rate)
    else:
        raise ValueError(
            f'Harmonic analysis features {features} are not defined')

    # Observation scaling: the decode's low-frequency prior
    # (harmonics.py:228-229) is calibrated for raw STFT magnitudes;
    # log-scale LPC envelopes and [-1, 1] correlations need gain to
    # compete with it (deviation from the reference, whose non-stft
    # viterbi decodes collapse to the lowest bin)
    observation_scale = {'stft': 1., 'lpc': 100., 'posteriorgram': 400.}

    if decoder == 'peak':
        harmonics = peak_pick(frames, frequencies, max_harmonics)
    elif decoder == 'viterbi':
        harmonics = viterbi(
            frames * observation_scale[features],
            frequencies,
            pitch,
            max_harmonics)
    else:
        raise ValueError(f'Harmonic decoder {decoder} is not defined')

    if return_features:
        return harmonics, frames.T
    return harmonics


def from_file(file, pitch_file=None, **kwargs):
    pitch = (
        None if pitch_file is None else promonet_tpu.load.array(pitch_file))
    return from_audio(promonet_tpu.load.audio(file), pitch=pitch, **kwargs)


def from_file_to_file(file, output_file, pitch_file=None, **kwargs):
    promonet_tpu.load.save_array(
        output_file, np.asarray(from_file(file, pitch_file, **kwargs)))


def from_files_to_files(files, output_files, pitch_files=None, **kwargs):
    if pitch_files is None:
        pitch_files = [None] * len(files)
    for file, output_file, pitch_file in zip(
        files, output_files, pitch_files
    ):
        from_file_to_file(file, output_file, pitch_file, **kwargs)


###############################################################################
# Decode
###############################################################################


def peak_pick(frames, frequencies, max_harmonics=None):
    """Decode harmonics via peak-picking (harmonics.py:199-212)"""
    if max_harmonics is None:
        max_harmonics = promonet_tpu.MAX_HARMONICS
    frames = np.asarray(frames)
    frequencies = np.asarray(frequencies)
    harmonics = np.full((max_harmonics, len(frames)), np.nan, np.float32)
    for i, frame in enumerate(frames):
        peaks = scipy.signal.find_peaks(frame)[0]
        for j, p in enumerate(sorted(peaks)[:max_harmonics]):
            harmonics[j, i] = frequencies[p]
    return harmonics


def viterbi(
    frames,
    frequencies,
    pitch=None,
    max_harmonics=None,
    harmonic_width_ratio=0.8
):
    """Iterative masked Viterbi decoding of F0..Fk

    Reference: promonet/preprocess/harmonics.py:215-297. Each harmonic is
    decoded over a band around multiples of F0, with the already-decoded
    fundamental masking the observation.
    """
    if max_harmonics is None:
        max_harmonics = promonet_tpu.MAX_HARMONICS
    frames = jnp.asarray(frames)
    frequencies_np = np.asarray(frequencies)
    frequencies = jnp.asarray(frequencies)
    num_frames, num_states = frames.shape

    # Initial: linearly decreasing with frequency (harmonics.py:241-243)
    initial = jnp.linspace(1., 0., num_states)
    initial = initial / initial.sum()
    log_initial = jnp.log(jnp.clip(initial, 1e-12))

    def decode(observation):
        # Transition = log-frequency locality (harmonics.py:230-239),
        # computed on the fly inside the Pallas kernel — the dense
        # (N, N) matrix never materializes for the 2049-bin STFT axis
        # (ops/viterbi.decode_logfreq; scan fallback off-TPU)
        log_obs = jax.nn.log_softmax(observation, axis=-1)
        return viterbi_ops.decode_logfreq(
            log_obs, frequencies_np, log_initial)

    def mask(base, lo_hz, hi_hz):
        lo = jnp.searchsorted(frequencies, lo_hz)  # (frames,)
        hi = jnp.searchsorted(frequencies, hi_hz)
        cols = jnp.arange(num_states)[None, :]
        in_band = (cols >= lo[:, None]) & (cols < hi[:, None])
        return jnp.where(in_band, base, -jnp.inf)

    harmonics = np.full((max_harmonics, num_frames), np.nan, np.float32)

    i = 0
    if pitch is not None:
        f0 = jnp.asarray(pitch).reshape(-1)
        harmonics[0] = np.asarray(f0)
        i = 1
        observation = mask(
            frames,
            f0 * (1. + harmonic_width_ratio),
            f0 * (1. + 1. / harmonic_width_ratio))
    else:
        # Softmax with a low-frequency bias (harmonics.py:228-229)
        observation = frames + .5 * jnp.arange(num_states, 0, -1)

    while i < max_harmonics:
        path = decode(observation)
        harmonics[i] = np.asarray(frequencies[path])
        i += 1
        if i == max_harmonics:
            break
        f0 = jnp.asarray(harmonics[0])
        observation = mask(
            frames,
            f0 * (i + harmonic_width_ratio),
            f0 * (i + 1. / harmonic_width_ratio))

    return harmonics


###############################################################################
# Analysis features
###############################################################################


def _levinson_durbin(autocorrelation, order):
    """Levinson-Durbin recursion: autocorrelation → LPC coefficients

    Replaces librosa.lpc (promonet/preprocess/harmonics.py:305-330).
    """
    a = np.zeros(order + 1)
    a[0] = 1.
    error = autocorrelation[0]
    if error <= 0:
        return a
    for i in range(1, order + 1):
        acc = autocorrelation[i] + np.dot(
            a[1:i], autocorrelation[i - 1:0:-1])
        k = -acc / error
        a[1:i + 1] = a[1:i + 1] + k * a[i - 1::-1][:i]
        error *= (1. - k * k)
        if error <= 0:
            break
    return a


def lpc_coefficients(audio, sample_rate=None):
    """LPC spectral envelopes for harmonic analysis

    Reference: promonet/preprocess/harmonics.py:305-330 — Hamming-
    windowed frames → LPC of order sr/1000 + 2 → log-magnitude of the
    all-pole response at the analysis frequencies.
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    audio = np.asarray(audio)

    padding = (promonet_tpu.WINDOW_SIZE - promonet_tpu.HOPSIZE) // 2
    padded = np.pad(
        audio, [(0, 0)] * (audio.ndim - 1) + [(padding, padding)])
    samples = padded[0] if padded.ndim == 2 else padded
    num_frames = 1 + (
        (samples.shape[-1] - promonet_tpu.WINDOW_SIZE) //
        promonet_tpu.HOPSIZE)
    window = np.hamming(promonet_tpu.WINDOW_SIZE)
    order = int(sample_rate / 1000) + 2

    # Analysis frequencies (harmonics.py:318-320)
    frequencies = sample_rate * np.linspace(0., 1., promonet_tpu.NUM_FFT)
    frequencies = frequencies[:len(frequencies) // 2]

    result = np.empty((num_frames, len(frequencies)), np.float32)
    for i in range(num_frames):
        start = i * promonet_tpu.HOPSIZE
        frame = samples[start:start + promonet_tpu.WINDOW_SIZE] * window
        # Autocorrelation method LPC
        spectrum = np.fft.rfft(frame, 2 * promonet_tpu.WINDOW_SIZE)
        autocorrelation = np.fft.irfft(np.abs(spectrum) ** 2)[:order + 1]
        a = _levinson_durbin(autocorrelation, order)
        _, h = scipy.signal.freqz([1], a, worN=len(frequencies))
        result[i] = np.log10(np.abs(h) + 1e-12)

    # Crop below FMIN so the DC pole cannot absorb the decode (the stft
    # path crops identically, harmonics.py:425-428)
    minidx = int(np.searchsorted(frequencies, promonet_tpu.FMIN))
    return (
        jnp.asarray(result[:, minidx:]),
        jnp.asarray(frequencies[minidx:], dtype=jnp.float32))


def pitch_posteriorgram(audio, sample_rate=None, fmin=50., fmax=1600.):
    """Pitch posteriors over an extended range for harmonic analysis

    Reference: promonet/preprocess/harmonics.py:333-360 (penn posteriors
    masked to [50, 1600] Hz); here the NCC front-end runs over the
    extended candidate range.
    """
    from . import pitch as pitch_module

    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    audio = np.asarray(audio)

    freqs = pitch_module.candidate_frequencies(fmin, fmax, 512)

    # NCC over the extended range: reuse the front-end with a widened
    # candidate table by temporarily overriding the module constants
    import jax
    samples = jnp.asarray(audio)
    ncc = _ncc_over(samples, sample_rate, promonet_tpu.HOPSIZE, freqs)
    return ncc, jnp.asarray(freqs)


def _ncc_over(audio, sample_rate, hopsize, freqs):
    """NCC posteriorgram over an arbitrary candidate frequency table"""
    from . import pitch as pitch_module
    import jax

    window = pitch_module.WINDOW
    max_lag = int(np.ceil(sample_rate / freqs[0])) + 1
    context = window + max_lag
    samples = audio[0]
    num_frames = samples.shape[-1] // hopsize
    centers = (np.arange(num_frames) + 0.5) * hopsize
    starts = np.round(centers - context / 2).astype(np.int64)
    pad_left = max(0, -int(starts.min()))
    pad_right = max(0, int(starts.max()) + context - samples.shape[-1])
    padded = jnp.pad(samples, (pad_left, pad_right))
    idx = (starts + pad_left)[:, None] + np.arange(context)[None, :]
    frames = padded[idx]
    frames = frames - frames.mean(axis=-1, keepdims=True)

    n_fft = int(2 ** np.ceil(np.log2(context + window)))
    head = frames[:, :window]
    corr = jnp.fft.irfft(
        jnp.conj(jnp.fft.rfft(head, n=n_fft)) *
        jnp.fft.rfft(frames, n=n_fft),
        n=n_fft)[:, :max_lag + 1]
    sq = frames * frames
    cumsum = jnp.cumsum(jnp.pad(sq, ((0, 0), (1, 0))), axis=-1)
    tau = np.arange(max_lag + 1)
    energy = cumsum[:, tau + window] - cumsum[:, tau]
    ncc = corr / jnp.sqrt(energy[:, 0:1] * energy + 1e-9)

    lags = sample_rate / freqs
    lag_left = np.floor(lags).astype(np.int32)
    lag_frac = jnp.asarray(lags - lag_left, dtype=ncc.dtype)
    left = ncc[:, lag_left]
    right = ncc[:, np.minimum(lag_left + 1, max_lag)]
    return left * (1 - lag_frac) + right * lag_frac


def highpass_biquad(audio, sample_rate, cutoff, q=0.707):
    """RBJ high-pass biquad (replaces torchaudio.functional.highpass_biquad)"""
    w0 = 2 * np.pi * cutoff / sample_rate
    alpha = np.sin(w0) / (2 * q)
    cosw = np.cos(w0)
    b = np.array([(1 + cosw) / 2, -(1 + cosw), (1 + cosw) / 2])
    a = np.array([1 + alpha, -2 * cosw, 1 - alpha])
    return scipy.signal.lfilter(b / a[0], a / a[0], audio, axis=-1).astype(
        np.float32)


def stft_features(audio, sample_rate=None, fmin=None, fmax=None):
    """High-passed, band-limited STFT magnitudes for harmonic analysis

    Reference: promonet/preprocess/harmonics.py:363-428.
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    if fmin is None:
        fmin = promonet_tpu.FMIN
    if fmax is None:
        fmax = sample_rate // 2

    audio = np.asarray(audio)
    num_frames = audio.shape[-1] // promonet_tpu.HOPSIZE

    # Remove low frequencies, then band-limit by resampling
    audio = highpass_biquad(audio, sample_rate, 1.33 * fmin)
    target_sample_rate = 2 * fmax
    audio = promonet_tpu.utils.audio.resample(
        audio, sample_rate, target_sample_rate)

    num_fft = 4096
    hopsize = int(promonet_tpu.HOPSIZE * target_sample_rate / sample_rate)
    size = (
        hopsize * (num_frames - (audio.shape[-1] // hopsize)) // 2 +
        (num_fft - promonet_tpu.HOPSIZE) // 2)
    audio = np.pad(
        audio, [(0, 0)] * (audio.ndim - 1) + [(size, size)], mode='reflect')

    window = stft_ops.hann_window(num_fft)
    spectrogram = stft_ops.stft(
        jnp.asarray(audio[0]),
        num_fft,
        hopsize,
        window=window,
        magnitude=True,
        magnitude_epsilon=1e-6)

    frequencies = np.abs(
        np.fft.fftfreq(num_fft, 1 / target_sample_rate)[:num_fft // 2 + 1])
    minidx = int(np.searchsorted(frequencies, fmin))
    return (
        jnp.swapaxes(spectrogram[minidx:], -1, -2),
        jnp.asarray(frequencies[minidx:], dtype=jnp.float32))
