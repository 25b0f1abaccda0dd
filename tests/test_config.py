"""Config system tests"""
import promonet_tpu


def test_defaults():
    assert promonet_tpu.SAMPLE_RATE == 22050
    assert promonet_tpu.HOPSIZE == 256
    assert promonet_tpu.CHUNK_SIZE == 16384
    assert promonet_tpu.PITCH_BINS == 256


def test_derived_statics():
    # NUM_FEATURES = 40 ppg + 64 pitch embedding + 8 loudness + 1 periodicity
    assert promonet_tpu.NUM_FEATURES == 113
    # GLOBAL_CHANNELS = 256 speaker + 1 pitch aug + 1 loudness aug
    assert promonet_tpu.GLOBAL_CHANNELS == 258
    assert promonet_tpu.NUM_SPEAKERS == 109


def test_config_composition(tmp_path):
    """User config modules override defaults (yapecs semantics)"""
    from promonet_tpu.config import core
    config = tmp_path / 'test_config.py'
    config.write_text("MODULE = 'promonet_tpu'\nTEST_VALUE = 42\n")

    class FakeDefaults:
        pass

    defaults = FakeDefaults()
    core.configure('promonet_tpu', defaults, [str(config)])
    assert defaults.TEST_VALUE == 42


def test_config_wrong_module_ignored(tmp_path):
    from promonet_tpu.config import core
    config = tmp_path / 'other.py'
    config.write_text("MODULE = 'not_promonet'\nTEST_VALUE = 42\n")

    class FakeDefaults:
        pass

    defaults = FakeDefaults()
    core.configure('promonet_tpu', defaults, [str(config)])
    assert not hasattr(defaults, 'TEST_VALUE')
