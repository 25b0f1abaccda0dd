"""DSP op golden tests against scipy/torch references (SURVEY.md §4)"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import promonet_tpu
from promonet_tpu import ops


def test_hann_window_matches_torch():
    import torch
    ours = np.asarray(ops.hann_window(1024))
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_matches_torch(audio):
    import torch
    n_fft, hop = 1024, 256
    window = ops.hann_window(n_fft)
    ours = np.asarray(
        ops.stft.stft(jnp.asarray(audio[0]), n_fft, hop,
                      window=window, magnitude=True))
    theirs = torch.stft(
        torch.from_numpy(audio[0]),
        n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=False,
        return_complex=True).abs().numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_spectrogram_shape_and_parity(audio):
    import torch
    spec = np.asarray(promonet_tpu.preprocess.spectrogram.from_audio(audio))
    frames = audio.shape[-1] // promonet_tpu.HOPSIZE
    assert spec.shape == (513, frames)

    # Parity with the reference formulation (torch.stft + sqrt(+1e-6))
    padded = torch.nn.functional.pad(
        torch.from_numpy(audio), (384, 384), mode='reflect')
    st = torch.stft(
        padded.squeeze(0) if padded.ndim == 2 else padded,
        1024,
        hop_length=256,
        window=torch.hann_window(1024),
        center=False,
        return_complex=True)
    reference = torch.sqrt(
        torch.view_as_real(st).pow(2).sum(-1) + 1e-6).numpy()
    if reference.ndim == 3:
        reference = reference[0]
    np.testing.assert_allclose(spec, reference, atol=5e-3, rtol=1e-2)


def test_mel_filterbank_invariants():
    basis = np.asarray(ops.mel_filterbank(22050, 1024, 80))
    assert basis.shape == (80, 513)
    # Every filter is nonnegative with nonzero support
    assert (basis >= 0).all()
    assert (basis.sum(axis=1) > 0).all()
    # Peak positions are monotonically increasing
    peaks = basis.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_istft_inverts_stft(audio):
    """ISTFT(STFT(x)) == x in the interior (Vocos head contract)"""
    n_fft, hop = 1024, 256
    window = ops.hann_window(n_fft)
    x = jnp.asarray(audio[0])
    pad = (n_fft - hop) // 2
    padded = ops.stft.reflect_pad(x, pad)
    spec = ops.stft.stft(padded, n_fft, hop, window=window)
    recon = np.asarray(ops.istft(spec, n_fft, hop, window))
    target = np.asarray(x)[:recon.shape[-1]]
    # Interior samples (edges lack full overlap)
    np.testing.assert_allclose(
        recon[hop:-hop], target[hop:-hop], atol=1e-3)


def test_loudness_shapes_and_range(audio):
    full = promonet_tpu.preprocess.loudness.from_audio(audio, None)
    assert full.shape[0] == 513
    banded = promonet_tpu.preprocess.loudness.from_audio(audio, 8)
    assert banded.shape[0] == 8
    assert float(banded.min()) >= promonet_tpu.MIN_DB
    # Band average of full-band equals direct banded computation
    averaged = promonet_tpu.preprocess.loudness.band_average(full, 8)
    np.testing.assert_allclose(
        np.asarray(averaged), np.asarray(banded), atol=1e-4)


def test_limiter_bounds():
    rng = np.random.default_rng(0)
    loud = (3. * rng.standard_normal((1, 2000))).astype(np.float32)
    limited = np.asarray(promonet_tpu.preprocess.loudness.limit(loud))
    assert limited.shape == loud.shape
    assert np.abs(limited).max() <= 1.5  # envelope-limited, not hard-clipped
    # Quiet audio passes unchanged (gain stays 1, delay-compensated)
    quiet = (0.1 * rng.standard_normal((1, 2000))).astype(np.float32)
    limited_quiet = np.asarray(promonet_tpu.preprocess.loudness.limit(quiet))
    np.testing.assert_allclose(limited_quiet, quiet, atol=1e-5)


def test_grid_sample_matches_reference_semantics():
    """Linear grid sampling == the reference searchsorted+lerp
    (promonet/edit/grid.py:12-38)"""
    import torch
    sequence = np.random.default_rng(0).standard_normal((3, 17)).astype(
        np.float32)
    grid = np.linspace(0, 16, 9).astype(np.float32)

    ours = np.asarray(ops.grid.sample(jnp.asarray(sequence), grid))

    fp = torch.from_numpy(sequence)
    x = torch.from_numpy(grid)
    xp = torch.arange(fp.shape[-1])
    i = torch.searchsorted(xp, x, side='right')
    fp_pad = torch.nn.functional.pad(fp, (0, 1), mode='replicate')
    xp_pad = torch.cat((xp, xp[-1:] + 1))
    theirs = (
        fp_pad[..., i - 1] * (xp_pad[i] - x) +
        fp_pad[..., i] * (x - xp_pad[i - 1])).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_constructors():
    x = jnp.zeros((4, 100))
    grid = ops.grid.constant(x, 2.)
    assert grid.shape == (50,)
    assert float(grid[0]) == 0.
    assert np.isclose(float(grid[-1]), 99.)
    grid = ops.grid.of_length(x, 33)
    assert grid.shape == (33,)


def test_sparsify_methods():
    rng = np.random.default_rng(0)
    ppg = jax.nn.softmax(jnp.asarray(rng.standard_normal((40, 12))), axis=0)
    for method, threshold in (
        ('percentile', 0.85), ('constant', 0.02), ('topk', 4)
    ):
        sparse = ops.sparsify(ppg, method, threshold)
        sums = np.asarray(sparse.sum(axis=0))
        np.testing.assert_allclose(sums, 1., atol=1e-4)
        # Sparser than the input
        assert (np.asarray(sparse) == 0).sum() > 0


def test_jensen_shannon_properties():
    p = jax.nn.softmax(jnp.asarray(
        np.random.default_rng(0).standard_normal((40, 6))), axis=0)
    # Identity -> 0
    np.testing.assert_allclose(
        np.asarray(ops.jensen_shannon(p, p)), 0., atol=1e-3)
    # Disjoint -> 1
    a = jnp.zeros((4, 1)).at[0, 0].set(1.)
    b = jnp.zeros((4, 1)).at[1, 0].set(1.)
    np.testing.assert_allclose(
        np.asarray(ops.jensen_shannon(a, b)), 1., atol=1e-3)


def test_viterbi_matches_brute_force():
    """Scan Viterbi equals exhaustive search on a small problem"""
    rng = np.random.default_rng(0)
    T, N = 6, 4
    obs = np.log(
        jax.nn.softmax(jnp.asarray(rng.standard_normal((T, N))), axis=-1))
    trans = np.asarray(
        promonet_tpu.ops.viterbi.triangular_transition(N, 2.))
    init = np.full(N, -np.log(N))

    path = np.asarray(promonet_tpu.ops.viterbi.decode(
        jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(init),
        use_pallas=False))

    # Brute force
    import itertools
    best, best_score = None, -np.inf
    for candidate in itertools.product(range(N), repeat=T):
        score = init[candidate[0]] + obs[0][candidate[0]]
        for t in range(1, T):
            score += trans[candidate[t - 1], candidate[t]] + \
                obs[t][candidate[t]]
        if score > best_score:
            best, best_score = candidate, score
    np.testing.assert_array_equal(path, np.asarray(best))


def test_viterbi_interpret_kernel_matches_scan():
    """Pallas kernel (interpret mode) == scan implementation"""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(1)
    T, N = 12, 128
    obs = jnp.asarray(
        np.log(jax.nn.softmax(rng.standard_normal((T, N)), axis=-1)),
        dtype=jnp.float32)
    trans = promonet_tpu.ops.viterbi.triangular_transition(N, 5.)
    init = jnp.full((N,), -np.log(N))

    scan_path = promonet_tpu.ops.viterbi.decode(
        obs, trans, init, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        kernel_path = promonet_tpu.ops.viterbi.decode(
            obs, trans, init, use_pallas=True)
    np.testing.assert_array_equal(
        np.asarray(scan_path), np.asarray(kernel_path))


def test_viterbi_logfreq_matches_dense():
    """On-the-fly log-frequency kernel == dense decode (small N)"""
    from jax.experimental.pallas import tpu as pltpu
    viterbi = promonet_tpu.ops.viterbi
    rng = np.random.default_rng(3)
    T, N = 70, 200  # N not a lane multiple: exercises padding
    frequencies = np.linspace(50., 8000., N)
    obs = jnp.asarray(
        np.log(jax.nn.softmax(
            3. * rng.standard_normal((T, N)), axis=-1)),
        dtype=jnp.float32)
    initial = jnp.asarray(
        np.log(np.linspace(1., .01, N) / np.linspace(1., .01, N).sum()),
        dtype=jnp.float32)

    dense = viterbi.decode(
        obs,
        viterbi.logfreq_transition_dense(frequencies),
        initial,
        use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        kernel = viterbi.decode_logfreq(
            obs, frequencies, initial, use_pallas=True, time_chunk=16)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(kernel))


@pytest.mark.slow
def test_viterbi_logfreq_large_state():
    """The harmonics-scale decode (N=2049) through the Pallas path"""
    from jax.experimental.pallas import tpu as pltpu
    viterbi = promonet_tpu.ops.viterbi
    rng = np.random.default_rng(4)
    T, N = 40, 2049
    frequencies = np.linspace(60., 11025., N)
    obs = jnp.asarray(
        np.log(jax.nn.softmax(
            3. * rng.standard_normal((T, N)), axis=-1)),
        dtype=jnp.float32)
    initial = jnp.full((N,), -np.log(N), jnp.float32)

    dense = viterbi.decode(
        obs,
        viterbi.logfreq_transition_dense(frequencies),
        initial,
        use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        kernel = viterbi.decode_logfreq(
            obs, frequencies, initial, use_pallas=True, time_chunk=8)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(kernel))


def test_masked_interp():
    """Linear interpolation through masked regions (unvoiced pitch)"""
    values = jnp.asarray([1., 99., 99., 4., 99., 6.])
    mask = jnp.asarray([True, False, False, True, False, True])
    out = np.asarray(ops.grid.masked_interp(values, mask))
    np.testing.assert_allclose(out, [1., 2., 3., 4., 5., 6.], atol=1e-5)
    # Edges extrapolate to the nearest anchor
    mask = jnp.asarray([False, True, True, False, False, False])
    values = jnp.asarray([99., 2., 4., 99., 99., 99.])
    out = np.asarray(ops.grid.masked_interp(values, mask))
    np.testing.assert_allclose(out, [2., 2., 4., 4., 4., 4.], atol=1e-5)


###############################################################################
# Sub-pixel (polyphase) transposed convolution
###############################################################################


@pytest.mark.parametrize(
    'kernel_size,stride,padding,in_ch,out_ch',
    [
        (16, 8, 4, 12, 6),   # HiFi-GAN stages 1-2
        (4, 2, 1, 8, 4),     # HiFi-GAN stages 3-4
        (6, 3, 2, 5, 7),     # non-power-of-two
        (5, 1, 2, 4, 4),     # stride 1 falls back to dilated path
    ])
def test_subpixel_transposed_conv_parity(
    kernel_size, stride, padding, in_ch, out_ch
):
    """Polyphase lowering must match the lhs-dilated reference exactly.

    Both variants share one parameter tree, so checkpoints trained with
    either lowering load into the other.
    """
    from promonet_tpu.models.modules import WNConvTranspose1d
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 19, in_ch)),
        jnp.float32)
    ref = WNConvTranspose1d(
        out_ch, kernel_size, stride, padding, subpixel=False)
    sub = WNConvTranspose1d(
        out_ch, kernel_size, stride, padding, subpixel=True)
    params = ref.init(jax.random.PRNGKey(1), x)
    a = ref.apply(params, x)
    b = sub.apply(params, x)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_subpixel_transposed_conv_matches_torch():
    """Both lowerings must match torch.nn.ConvTranspose1d

    Layout note: our (k, in, out) kernel is TIME-REVERSED relative to
    torch's ConvTranspose1d (in, out, k) weight — lax convolutions are
    cross-correlations and the lhs-dilated formulation absorbs the flip.
    Anything porting torch transposed-conv weights must reverse the
    kernel axis (as this test does).
    """
    import torch
    from promonet_tpu.models.modules import WNConvTranspose1d
    in_ch, out_ch, k, s, p = 6, 5, 16, 8, 4
    x = np.random.default_rng(2).standard_normal((1, 17, in_ch)).astype(
        np.float32)
    module = WNConvTranspose1d(out_ch, k, s, p, subpixel=True)
    params = module.init(jax.random.PRNGKey(3), jnp.asarray(x))
    ours = np.asarray(module.apply(params, jnp.asarray(x)))

    leaves = params['params']
    v = np.asarray(leaves['kernel_v'])      # (k, in, out)
    g = np.asarray(leaves['kernel_g'])
    bias = np.asarray(leaves['bias'])
    norm = np.sqrt((v ** 2).sum(axis=(0, 2), keepdims=True) + 1e-12)
    w = (v * g / norm)[::-1].copy()          # flip time axis for torch
    conv = torch.nn.ConvTranspose1d(in_ch, out_ch, k, s, p)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w).permute(1, 2, 0))  # (in, out, k)
        conv.bias.copy_(torch.tensor(bias))
        theirs = conv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-5)


def test_bucket_ladder_override():
    """Scoped coarse ladder replaces the dense default and restores it"""
    # promonet_tpu.data re-exports the collate() FUNCTION under the
    # module's name; import the module itself for its helpers
    import importlib
    collate = importlib.import_module('promonet_tpu.data.collate')

    default = collate.bucket_frames(5)
    assert default in promonet_tpu.INFERENCE_FRAME_BUCKETS
    with collate.bucket_ladder([96, 192]):
        assert collate.bucket_frames(5) == 96
        assert collate.bucket_frames(97) == 192
        assert collate.bucket_frames(300) == 300  # beyond the ladder
        with collate.bucket_ladder([64]):
            assert collate.bucket_frames(5) == 64
        assert collate.bucket_frames(5) == 96
    assert collate.bucket_frames(5) == default
