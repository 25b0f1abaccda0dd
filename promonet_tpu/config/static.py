"""Derived configuration, computed after user-config merge.

Reference: promonet/config/static.py
"""
import math

import promonet_tpu


###############################################################################
# Audio parameters
###############################################################################


# Threshold to sparsify Mel spectrograms
LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD = (
    None if promonet_tpu.DYNAMIC_RANGE_COMPRESSION_THRESHOLD is None else
    math.log(promonet_tpu.DYNAMIC_RANGE_COMPRESSION_THRESHOLD))

# Base-2 log of pitch range boundaries
LOG_FMIN = math.log2(promonet_tpu.FMIN)
LOG_FMAX = math.log2(promonet_tpu.FMAX)


###############################################################################
# Directories
###############################################################################


# Location to save data augmentation information
AUGMENT_DIR = promonet_tpu.ASSETS_DIR / 'augmentations'

# Location to save dataset partitions
PARTITION_DIR = (
    promonet_tpu.ASSETS_DIR /
    'partitions' /
    ('adaptation' if promonet_tpu.ADAPTATION else 'multispeaker'))


###############################################################################
# Model parameters
###############################################################################


# Global input channels (speaker embedding + augmentation ratio channels)
GLOBAL_CHANNELS = (
    promonet_tpu.SPEAKER_CHANNELS +
    promonet_tpu.AUGMENT_PITCH +
    promonet_tpu.AUGMENT_LOUDNESS)

# Number of input features to the generator
NUM_FEATURES = promonet_tpu.NUM_MELS if promonet_tpu.SPECTROGRAM_ONLY else (
    promonet_tpu.PPG_CHANNELS +
    ('loudness' in promonet_tpu.INPUT_FEATURES) * promonet_tpu.LOUDNESS_BANDS +
    ('periodicity' in promonet_tpu.INPUT_FEATURES) +
    ('pitch' in promonet_tpu.INPUT_FEATURES) * (
        promonet_tpu.PITCH_EMBEDDING_SIZE
        if promonet_tpu.PITCH_EMBEDDING else 1))

# Number of input features to the discriminator
NUM_FEATURES_DISCRIM = 1

# Number of speakers
_NUM_SPEAKERS_BY_DATASET = {
    'daps': 20,
    'libritts': 1230,
    'vctk': 109,
    # Zero-egress formant-synthesis corpus (data/synthetic.py)
    'synthetic': promonet_tpu.SYNTHETIC_SPEAKERS,
}
if hasattr(promonet_tpu.config.defaults, 'NUM_SPEAKERS'):
    # A user config file may pin the speaker count directly
    NUM_SPEAKERS = promonet_tpu.config.defaults.NUM_SPEAKERS
elif promonet_tpu.TRAINING_DATASET in _NUM_SPEAKERS_BY_DATASET:
    NUM_SPEAKERS = _NUM_SPEAKERS_BY_DATASET[promonet_tpu.TRAINING_DATASET]
else:
    # Speaker adaptation datasets are single-speaker
    NUM_SPEAKERS = 1

# Number of previous samples
if promonet_tpu.MODEL == 'cargan':
    NUM_PREVIOUS_SAMPLES = promonet_tpu.CARGAN_INPUT_SIZE
elif promonet_tpu.MODEL == 'fargan':
    NUM_PREVIOUS_SAMPLES = (
        promonet_tpu.HOPSIZE * promonet_tpu.FARGAN_PREVIOUS_FRAMES)
else:
    NUM_PREVIOUS_SAMPLES = 1
