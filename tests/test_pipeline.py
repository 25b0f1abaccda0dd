"""End-to-end pipeline tests over a synthetic corpus (SURVEY.md §4)"""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import promonet_tpu

import pytest as _pytest

pytestmark = _pytest.mark.slow


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    """Synthetic dataset with cache + partitions in a temp tree"""
    tmp = tmp_path_factory.mktemp('corpus')
    old = (
        promonet_tpu.CACHE_DIR,
        promonet_tpu.ASSETS_DIR,
        promonet_tpu.AUGMENT_DIR,
        promonet_tpu.RESULTS_DIR,
        promonet_tpu.EVAL_DIR)
    promonet_tpu.CACHE_DIR = tmp / 'cache'
    promonet_tpu.ASSETS_DIR = tmp / 'assets'
    promonet_tpu.AUGMENT_DIR = tmp / 'assets' / 'augmentations'
    promonet_tpu.RESULTS_DIR = tmp / 'results'
    promonet_tpu.EVAL_DIR = tmp / 'eval'
    promonet_tpu.data.synthetic.create(
        'synthetic', speakers=2, utterances=3, seconds=1.0)
    yield tmp
    (
        promonet_tpu.CACHE_DIR,
        promonet_tpu.ASSETS_DIR,
        promonet_tpu.AUGMENT_DIR,
        promonet_tpu.RESULTS_DIR,
        promonet_tpu.EVAL_DIR) = old


def test_cache_layout(corpus):
    """Reference cache layout: wav + per-feature files per stem"""
    cache = promonet_tpu.CACHE_DIR / 'synthetic'
    stem = cache / '0000' / '000000-100'
    assert stem.with_suffix('.wav').exists()
    for suffix in (
        '-loudness.npy', '-viterbi-pitch.npy', '-viterbi-periodicity.npy',
        '-spectrogram.npy', '-ppg.npy'
    ):
        assert (cache / '0000' / f'000000-100{suffix}').exists(), suffix
    # Full-band loudness in the cache (data preprocessing convention)
    loudness = np.load(cache / '0000' / '000000-100-loudness.npy')
    assert loudness.shape[0] == 513


def test_dataset_and_loader(corpus):
    dataset = promonet_tpu.data.Dataset('synthetic', 'train')
    assert len(dataset) > 0
    item = dataset[0]
    frames = item['pitch'].shape[-1]
    assert item['ppg'].shape == (promonet_tpu.PPG_CHANNELS, frames)
    assert item['loudness'].shape[-1] == frames
    assert item['audio'].shape[-1] >= frames * promonet_tpu.HOPSIZE

    loader = promonet_tpu.data.loader('synthetic', 'valid')
    batch = next(iter(loader))
    # Padded to a bucket
    assert batch['pitch'].shape[-1] in promonet_tpu.INFERENCE_FRAME_BUCKETS


def test_augmentation(corpus, monkeypatch):
    promonet_tpu.data.augment.datasets(['synthetic'])
    for kind in ('pitch', 'loudness'):
        file = promonet_tpu.AUGMENT_DIR / f'synthetic-{kind}.json'
        assert file.exists()
        with open(file) as f:
            ratios = json.load(f)
        assert len(ratios) == 6  # 2 speakers x 3 utterances
        # Augmented wavs written next to originals
        for stem, ratio in list(ratios.items())[:2]:
            prefix = kind[0]
            wav = (
                promonet_tpu.CACHE_DIR / 'synthetic' /
                f'{stem}-{prefix}{ratio}.wav')
            assert wav.exists()
            assert 50 <= ratio <= 200

    # After (re-)preprocessing, augmented variants join the training set
    # (promonet/data/dataset.py:34-48)
    promonet_tpu.data.preprocess.datasets(['synthetic'])
    dataset = promonet_tpu.data.Dataset('synthetic', 'train')
    originals = [s for s in dataset.stems if s.endswith('-100')]
    augmented = [s for s in dataset.stems if not s.endswith('-100')]
    assert len(augmented) == 2 * len(originals), dataset.stems
    # Augmented items load, with ratios parsed from the stem suffix
    index = dataset.stems.index(augmented[0])
    item = dataset[index]
    assert (
        float(item['spectral_balance_ratios']) != 1. or
        float(item['loudness_ratios']) != 1.)


def test_partition(corpus):
    partition = promonet_tpu.partition.dataset('synthetic')
    stems = (
        set(partition['train']) | set(partition['valid']) |
        set(partition['test']))
    # Only originals partitioned, no overlap
    assert all(stem.endswith('-100') for stem in stems)
    assert not (set(partition['train']) & set(partition['test']))

    adapt = promonet_tpu.partition.adaptation_partitions('synthetic')
    assert 'train-adapt-00' in adapt and 'test-adapt-00' in adapt


def test_pitch_distribution(corpus, monkeypatch):
    """Variable-bin boundaries from cached voiced pitch

    The cache is keyed on the resolved stats file, so the temp-corpus
    distribution computed here cannot leak into tests running against
    the repo's real assets (round-5 fix in load.pitch_distribution).
    """
    distribution = promonet_tpu.load.pitch_distribution('synthetic')
    assert distribution.shape == (promonet_tpu.PITCH_BINS,)
    assert (np.diff(distribution) >= 0).all()
    assert distribution.min() >= promonet_tpu.FMIN
    assert distribution.max() <= promonet_tpu.FMAX


def test_world_baseline(corpus, audio):
    """DSP baseline: analysis/synthesis and time-stretch"""
    out = promonet_tpu.baseline.world.from_audio(audio)
    assert out.shape[0] == 1
    assert np.isfinite(out).all()
    # Time-stretch via parameter interpolation
    frames = audio.shape[-1] // promonet_tpu.HOPSIZE
    grid = np.linspace(0, frames - 1, frames // 2)
    stretched = promonet_tpu.baseline.world.from_audio(audio, grid=grid)
    assert abs(
        stretched.shape[-1] - len(grid) * promonet_tpu.HOPSIZE) <= 256


def test_edit_selective_stretch(audio):
    """PPG-aware stretch exempting silence preserves total ratio"""
    loudness, pitch, periodicity, ppg = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    edited = promonet_tpu.edit.from_features(
        loudness, pitch, periodicity, ppg,
        time_stretch_ratio=1.5,
        stretch_silence=False)
    target = round(pitch.shape[-1] / 1.5)
    assert abs(edited[1].shape[-1] - target) <= 1


def test_pack_roundtrip(corpus):
    """Packed features unpack to the originals (export contract)"""
    from promonet_tpu.models import export
    cache = promonet_tpu.CACHE_DIR / 'synthetic' / '0000'
    loudness = np.load(cache / '000000-100-loudness.npy')[None]
    pitch = np.load(cache / '000000-100-viterbi-pitch.npy').reshape(1, -1)
    periodicity = np.load(
        cache / '000000-100-viterbi-periodicity.npy').reshape(1, -1)
    ppg = np.load(cache / '000000-100-ppg.npy')[None]

    packed = export.pack_features(
        jnp.asarray(loudness),
        jnp.asarray(pitch[0])[None],
        jnp.asarray(periodicity[0])[None],
        jnp.asarray(ppg),
        jnp.asarray([3]),
        jnp.asarray([1.1]),
        jnp.asarray([0.9]))
    assert packed.shape == (
        1,
        promonet_tpu.LOUDNESS_BANDS + 2 + promonet_tpu.PPG_CHANNELS + 3,
        pitch.shape[-1])

    unpacked = export.unpack_features(packed)
    np.testing.assert_allclose(np.asarray(unpacked[1]), pitch, atol=1e-5)
    np.testing.assert_allclose(np.asarray(unpacked[2]), periodicity, atol=1e-5)
    assert int(unpacked[4][0]) == 3
    np.testing.assert_allclose(float(unpacked[5][0]), 1.1, atol=1e-6)


def test_metrics():
    """Metric bundle matches hand computation"""
    metrics = promonet_tpu.evaluate.Metrics(include_wer=False)
    rng = np.random.default_rng(0)
    pitch = rng.uniform(100, 300, 50)
    periodicity = np.full(50, .5)
    ppg = jax.nn.softmax(jnp.asarray(rng.standard_normal((40, 50))), axis=0)
    loudness = rng.uniform(-80, -20, 50)

    metrics.update(
        loudness, loudness + 3.,
        pitch, periodicity,
        pitch * 2 ** (100 / 1200), periodicity + .05,
        ppg, ppg)
    values = metrics()
    assert np.isclose(values['pitch'], 100., atol=1e-3)
    assert np.isclose(values['loudness']['loudness'], 3., atol=1e-3)
    assert np.isclose(values['periodicity'], .05, atol=1e-4)
    assert values['ppg'] < 1e-3


def test_wer():
    from promonet_tpu.evaluate.metrics import WER
    wer = WER()
    wer.update('the cat sat', 'the cat sat')
    assert wer() == 0.
    wer.reset()
    wer.update('the cat sat', 'the dog sat')
    assert np.isclose(wer(), 1 / 3)


def test_plot(corpus, tmp_path, audio):
    loudness, pitch, periodicity, ppg = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    figure = promonet_tpu.plot.from_features(
        audio=np.asarray(audio),
        loudness=np.asarray(loudness),
        pitch=np.asarray(pitch),
        periodicity=np.asarray(periodicity),
        ppg=np.asarray(ppg),
        target_pitch=np.asarray(pitch) * 1.1)
    out = tmp_path / 'figure.png'
    figure.savefig(out)
    assert out.stat().st_size > 1000


def test_speaker_embedding_fallback(audio):
    embedding = promonet_tpu.preprocess.speaker.from_audio(np.asarray(audio))
    assert embedding.shape == (promonet_tpu.WAVLM_EMBEDDING_CHANNELS,)
    assert np.isclose(np.linalg.norm(embedding), 1., atol=1e-4)


def test_speaker_encoder_embedding(audio):
    """Trained x-vector-style encoder: unit-norm, deterministic, and
    invariant to trailing padding (masked stats pooling)"""
    from promonet_tpu.preprocess import speaker
    one = speaker.encoder_embedding(np.asarray(audio))
    two = speaker.encoder_embedding(np.asarray(audio))
    assert one.shape == (promonet_tpu.WAVLM_EMBEDDING_CHANNELS,)
    assert np.isclose(np.linalg.norm(one), 1., atol=1e-4)
    np.testing.assert_allclose(one, two)
    # Stats pooling is masked: junk beyond the valid frame count does
    # not leak into the embedding
    encoder, params = speaker._encoder()
    rng = np.random.default_rng(0)
    mels = rng.standard_normal((1, 256, promonet_tpu.NUM_MELS))
    longer = np.concatenate(
        [mels, 100. * rng.standard_normal(
            (1, 128, promonet_tpu.NUM_MELS))], axis=1)
    count = np.asarray([200], np.int32)
    short_out = np.asarray(encoder.module.apply(params, mels, count))
    long_out = np.asarray(encoder.module.apply(params, longer, count))
    np.testing.assert_allclose(short_out, long_out, rtol=1e-5, atol=1e-5)


def test_harmonics(audio):
    harmonics = promonet_tpu.preprocess.harmonics.from_audio(
        np.asarray(audio), decoder='viterbi')
    frames = audio.shape[-1] // promonet_tpu.HOPSIZE
    assert harmonics.shape == (promonet_tpu.MAX_HARMONICS, frames)
    # Harmonic ordering where defined
    finite = np.isfinite(harmonics).all(axis=0)
    assert (harmonics[1, finite] >= harmonics[0, finite]).mean() > 0.8


def test_evaluate_datasets(corpus, monkeypatch):
    """Offline evaluation: conditions, metrics, RTF benchmark, results.json"""
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    monkeypatch.setattr(promonet_tpu, 'EVALUATION_RATIOS', [1.414])
    # Clear the synthesize model cache (config changed)
    if hasattr(promonet_tpu.synthesize.core._cached_model, 'cache'):
        promonet_tpu.synthesize.core._cached_model.cache = {}

    results = promonet_tpu.evaluate.datasets(
        ['synthetic'], checkpoint=None, max_stems=1)

    synthetic = results['synthetic']
    objective = synthetic['objective']
    assert set(objective) == {
        'reconstructed', 'shifted-141', 'stretched-141', 'scaled-141',
        'balance-141', 'loudness-141'}
    for condition, values in objective.items():
        assert np.isfinite(values['pitch']), condition
        assert np.isfinite(values['ppg']), condition
    assert 'edit' in synthetic['benchmark']
    assert synthetic['benchmark']['generate']['rtf'] > 0

    out = promonet_tpu.RESULTS_DIR / promonet_tpu.CONFIG / 'synthetic'
    assert (out / 'results.json').exists()
    # Per-speaker results files (reference layout, evaluate/core.py:14-22)
    assert (out / '0000.json').exists()

    # Subjective/objective artifact export (reference evaluate/core.py:1-23)
    subjective = promonet_tpu.EVAL_DIR / 'subjective'
    assert list((subjective / 'original').glob('*.wav'))
    assert list((subjective / 'reconstructed').glob('*.wav'))
    assert list((subjective / 'shifted-141').glob('*.wav'))
    objective_dir = promonet_tpu.EVAL_DIR / 'objective' / 'reconstructed'
    assert list(objective_dir.glob('*-pitch.npy'))

    promonet_tpu.synthesize.core._cached_model.cache = {}


def test_evaluate_adapt(corpus, monkeypatch):
    """Adaptation-mode evaluation: per-speaker fine-tune then score

    Reference: promonet/evaluate/core.py:97-108,158-180.
    """
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    monkeypatch.setattr(promonet_tpu, 'MULTI_PERIOD_DISCRIMINATOR', False)
    monkeypatch.setattr(promonet_tpu, 'EVALUATION_RATIOS', [])
    # Small training shapes: without these the one-step adaptation
    # compiles the full batch-64 × 16384-sample GAN step on CPU (hours)
    monkeypatch.setattr(promonet_tpu, 'BATCH_SIZE', 2)
    monkeypatch.setattr(promonet_tpu, 'CHUNK_SIZE', 2048)
    monkeypatch.setattr(promonet_tpu, 'MESH_SHAPE', {'data': 2})
    monkeypatch.setattr(promonet_tpu, 'STEPS', 1)
    monkeypatch.setattr(promonet_tpu, 'ADAPTATION_STEPS', 1)
    monkeypatch.setattr(promonet_tpu, 'CHECKPOINT_INTERVAL', 10 ** 9)
    monkeypatch.setattr(promonet_tpu, 'DEFAULT_EVALUATION_STEPS', 0)
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', corpus / 'runs')
    if hasattr(promonet_tpu.synthesize.core._cached_model, 'cache'):
        promonet_tpu.synthesize.core._cached_model.cache = {}

    promonet_tpu.partition.adaptation_partitions(
        'synthetic', num_adapt_utterances=1)
    # Trim to one speaker: each speaker costs a full (small-model) CPU
    # train + synthesize + preprocess compile chain
    partition_file = (
        promonet_tpu.ASSETS_DIR / 'partitions' / 'adaptation' /
        'synthetic.json')
    partition = json.loads(partition_file.read_text())
    partition = {
        key: value for key, value in partition.items()
        if key.endswith('-00')}
    partition_file.write_text(json.dumps(partition))

    results = promonet_tpu.evaluate.datasets(
        ['synthetic'], adapt=True, max_stems=1)

    speakers = results['synthetic']['speakers']
    assert len(speakers) == 1
    for speaker_results in speakers.values():
        assert np.isfinite(
            speaker_results['objective']['reconstructed']['pitch'])
    # The speaker got its own adaptation run with a checkpoint
    run = (
        promonet_tpu.RUNS_DIR / promonet_tpu.CONFIG / 'adapt' /
        'synthetic' / '00')
    assert promonet_tpu.utils.checkpoint.latest_path(run) is not None

    promonet_tpu.synthesize.core._cached_model.cache = {}


def test_fused_edited_audio(corpus, monkeypatch, audio):
    """from_edited_audio (single-dispatch path) matches the 3-call API"""
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    if hasattr(promonet_tpu.synthesize.core._cached_model, 'cache'):
        promonet_tpu.synthesize.core._cached_model.cache = {}

    out = promonet_tpu.synthesize.from_edited_audio(
        np.asarray(audio),
        pitch_shift_cents=200.,
        time_stretch_ratio=1.414,
        loudness_scale_db=3.,
        speaker=1)
    frames = audio.shape[-1] // promonet_tpu.HOPSIZE
    expected = round(frames / 1.414) * promonet_tpu.HOPSIZE
    assert out.shape == (1, expected)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.

    # No-edit variant: output length equals input frames
    out = promonet_tpu.synthesize.from_edited_audio(np.asarray(audio))
    assert out.shape == (1, frames * promonet_tpu.HOPSIZE)
    promonet_tpu.synthesize.core._cached_model.cache = {}


def test_fargan_streaming_exact(monkeypatch, audio):
    """FARGAN chunked streaming carries the scan state: bit-identical to
    one offline pass (reference state contract:
    promonet/model/fargan.py:406-415)"""
    monkeypatch.setattr(promonet_tpu, 'MODEL', 'fargan')
    monkeypatch.setattr(promonet_tpu, 'PRECISION', 'float32')
    monkeypatch.setattr(
        promonet_tpu, 'NUM_PREVIOUS_SAMPLES', 2 * promonet_tpu.HOPSIZE)
    if hasattr(promonet_tpu.synthesize.core._cached_model, 'cache'):
        promonet_tpu.synthesize.core._cached_model.cache = {}

    loudness, pitch, periodicity, ppg = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    loudness = np.asarray(loudness)
    pitch = np.asarray(pitch)
    periodicity = np.asarray(periodicity)
    ppg = np.asarray(ppg)
    frames = pitch.shape[-1]

    from promonet_tpu.synthesize.stream import FARGANStreamer
    streamer = FARGANStreamer(speaker=0, chunk_frames=16)

    # Offline: one pass through the same model/params
    offline = np.asarray(streamer.model.apply(
        streamer.params,
        loudness[None] if loudness.ndim == 2 else loudness,
        pitch,
        periodicity,
        ppg[None] if ppg.ndim == 2 else ppg,
        np.asarray([0], np.int32),
        np.asarray([1.], np.float32),
        np.asarray([1.], np.float32)))[0]

    # Streamed: uneven feeds + terminal flush
    chunks = []
    step = 10
    for start in range(0, frames, step):
        sl = slice(start, start + step)
        chunks.append(streamer.feed(
            loudness[:, sl], pitch[:, sl], periodicity[:, sl], ppg[:, sl]))
    chunks.append(streamer.flush())
    streamed = np.concatenate(chunks, axis=-1)

    assert streamed.shape == offline.shape
    # Sample-exact up to float reassociation: the carry (sample buffer +
    # GRU states) is threaded exactly; the only remaining difference is
    # XLA's matmul tiling of the frame-conditioning network, which
    # reassociates float adds differently for different T (and varies
    # with CPU autotuning/threading). FARGAN's autoregressive feedback
    # amplifies those ~1e-7 seeds over time, so a fixed tiny bound on
    # the tail is flaky by construction. Robust contract instead:
    # the FIRST chunk (pre-feedback) matches tightly — state init is
    # identical — and the overall drift stays far below audibility
    # while the signals remain essentially identical.
    diff = np.abs(streamed - offline)
    first = diff[..., :promonet_tpu.HOPSIZE * 4]
    assert first.max() < 1e-5
    assert diff.max() < 2e-3
    denom = float(np.linalg.norm(streamed) * np.linalg.norm(offline))
    correlation = float((streamed * offline).sum()) / max(denom, 1e-12)
    assert correlation > 0.9999

    promonet_tpu.synthesize.core._cached_model.cache = {}


def test_streaming_matches_offline(monkeypatch, audio):
    """Windowed streaming output ~matches offline synthesis away from
    chunk boundaries"""
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    if hasattr(promonet_tpu.synthesize.core._cached_model, 'cache'):
        promonet_tpu.synthesize.core._cached_model.cache = {}

    loudness, pitch, periodicity, ppg = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    loudness = np.asarray(loudness)
    pitch = np.asarray(pitch)
    periodicity = np.asarray(periodicity)
    ppg = np.asarray(ppg)
    frames = pitch.shape[-1]

    from promonet_tpu.synthesize.stream import Streamer
    streamer = Streamer(speaker=0, chunk_frames=16, left_frames=8,
                        right_frames=8)
    chunks = []
    step = 10  # feed in uneven pieces
    for start in range(0, frames, step):
        sl = slice(start, start + step)
        chunks.append(streamer.feed(
            loudness[:, sl], pitch[:, sl], periodicity[:, sl], ppg[:, sl]))
    chunks.append(streamer.flush())
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == (1, frames * promonet_tpu.HOPSIZE)
    assert np.isfinite(streamed).all()
    assert streamer.latency_seconds > 0

    offline = promonet_tpu.synthesize.from_features(
        loudness, pitch, periodicity, ppg, speaker=0)
    # Same scale and strong correlation in the interior
    interior = slice(4096, frames * 256 - 4096)
    a = streamed[0, interior]
    b = np.asarray(offline)[0, interior]
    correlation = np.corrcoef(a, b)[0, 1]
    assert correlation > 0.9, correlation
    promonet_tpu.synthesize.core._cached_model.cache = {}


def test_evaluate_world_baseline(corpus, monkeypatch):
    """Evaluation harness dispatches through the WORLD baseline"""
    monkeypatch.setattr(promonet_tpu, 'MODEL', 'world')
    monkeypatch.setattr(promonet_tpu, 'EVALUATION_RATIOS', [1.414])
    results = promonet_tpu.evaluate.datasets(['synthetic'], max_stems=1)
    objective = results['synthetic']['objective']
    assert np.isfinite(objective['reconstructed']['pitch'])
    assert np.isfinite(objective['stretched-141']['pitch'])
