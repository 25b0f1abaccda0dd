"""Speaker adaptation and model export tests"""
import numpy as np
import jax
import pytest

import promonet_tpu

import pytest as _pytest

pytestmark = _pytest.mark.slow


@pytest.fixture
def small(monkeypatch, tmp_path):
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    monkeypatch.setattr(promonet_tpu, 'MULTI_PERIOD_DISCRIMINATOR', False)
    # Adversary-off (compile cost; adaptation mechanics don't depend
    # on the adversary training — see tests/test_train.py)
    monkeypatch.setattr(promonet_tpu, 'DISCRIMINATOR_START_STEP', 10**9)
    monkeypatch.setattr(
        promonet_tpu, 'ADVERSARIAL_LOSS_START_STEP', 10**9)
    # Skip the in-train step-0 evaluation (extractor compiles dominate;
    # the eval path is covered by tests/test_pipeline.py)
    from promonet_tpu.train import core as train_core
    monkeypatch.setattr(
        train_core, 'evaluate', lambda *args, **kwargs: None)
    monkeypatch.setattr(promonet_tpu, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(promonet_tpu, 'ASSETS_DIR', tmp_path / 'assets')
    monkeypatch.setattr(
        promonet_tpu, 'AUGMENT_DIR', tmp_path / 'assets' / 'augmentations')
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path / 'runs')
    monkeypatch.setattr(promonet_tpu, 'BATCH_SIZE', 2)
    monkeypatch.setattr(promonet_tpu, 'CHUNK_SIZE', 2048)
    monkeypatch.setattr(promonet_tpu, 'MESH_SHAPE', {'data': 1})
    monkeypatch.setattr(promonet_tpu, 'STEPS', 2)
    monkeypatch.setattr(promonet_tpu, 'EVALUATION_INTERVAL', 100)
    monkeypatch.setattr(promonet_tpu, 'CHECKPOINT_INTERVAL', 100)
    return tmp_path


def test_adapt_speaker(small, tmp_path):
    """Full few-shot adaptation pipeline (promonet/adapt/core.py:17-98):
    cache -> augment -> preprocess -> partition -> train"""
    # Target speaker audio on disk
    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        audio = promonet_tpu.data.synthetic.generate_utterance(
            rng, seconds=1.0)
        file = tmp_path / f'utterance{i}.wav'
        promonet_tpu.utils.audio.save(
            file, audio, promonet_tpu.SAMPLE_RATE)
        files.append(file)

    directory = promonet_tpu.adapt.speaker('testspeaker', files)

    # Training artifacts exist
    assert promonet_tpu.utils.checkpoint.latest_path(directory) is not None
    # Cache was created with features
    cache = promonet_tpu.CACHE_DIR / 'testspeaker' / '0000'
    assert (cache / '000000-100.wav').exists()
    assert (cache / '000000-100-loudness.npy').exists()
    # Augmentations recorded
    assert (promonet_tpu.AUGMENT_DIR / 'testspeaker-pitch.json').exists()


def test_export(small, tmp_path):
    """Packed-inference export: StableHLO artifact + params + self-check"""
    from promonet_tpu.models import export
    from promonet_tpu.train.core import create_state

    state = create_state(jax.random.PRNGKey(0))
    checkpoint = tmp_path / 'generator-00000001'
    promonet_tpu.utils.checkpoint.save(
        checkpoint, state['generator']['params'], step=1)

    output = export.from_file_to_file(checkpoint, tmp_path / 'exported')
    stablehlo = output.with_suffix('.stablehlo')
    assert stablehlo.exists() and stablehlo.stat().st_size > 1000

    # The serialized program round-trips and runs
    restored = jax.export.deserialize(stablehlo.read_bytes())
    x = np.zeros(
        (1, len(export.labels()), 8192 // promonet_tpu.HOPSIZE), np.float32)
    y = restored.call(x)
    assert np.asarray(y).shape == (1, 1, 8192)
