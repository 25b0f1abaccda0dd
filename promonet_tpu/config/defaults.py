"""Default configuration.

TPU-native re-design of the reference configuration surface
(reference: promonet/config/defaults.py). Hyperparameter names and values
match the reference so that experiment configs transfer 1:1; anything
torch-specific (optimizer partials, GPU queries) is replaced with a
framework-neutral specification resolved by the training layer. Comment
text is our own; only the identifiers and values are shared.
"""
import os
from pathlib import Path


###############################################################################
# Metadata
###############################################################################


# Name identifying this configuration (selects run/eval/results subdirs)
CONFIG = 'promonet'


###############################################################################
# Audio
###############################################################################


# Log-mel floor used when sparsifying spectrograms; None disables clamping
DYNAMIC_RANGE_COMPRESSION_THRESHOLD = None

# Pitch search range bounds
FMIN = 50.  # Hz
FMAX = 550.  # Hz

# Samples between analysis frames
HOPSIZE = 256  # samples

# Harmonic contours F0..Fk extracted by the harmonics module
MAX_HARMONICS = 3

# Loudness floor; silence clamps to this value
MIN_DB = -100.

# Mel filterbank size
NUM_MELS = 80

# FFT length for spectrograms (NUM_FFT // 2 + 1 frequency bins)
NUM_FFT = 1024

# Loudness value mapped to full scale
REF_DB = 20.

# Waveform rate used everywhere past the loader
SAMPLE_RATE = 22050  # Hz

# STFT analysis window length
WINDOW_SIZE = 1024


###############################################################################
# Data
###############################################################################


# Few-shot speaker adaptation mode (vs multi-speaker training)
ADAPTATION = False

# Every feature the preprocessor knows how to produce
ALL_FEATURES = [
    'loudness',
    'pitch',
    'periodicity',
    'ppg',
    'spectrogram',
    'text',
    'harmonics',
    'speaker']

# Train on loudness-scaled copies of each utterance
AUGMENT_LOUDNESS = True

# Train on pitch-shifted (resampled) copies of each utterance
AUGMENT_PITCH = True

# Log-uniform augmentation ratio range
AUGMENTATION_RATIO_MAX = 2.
AUGMENTATION_RATIO_MIN = .5

# Datasets the download/format layer supports
DATASETS = ['daps', 'libritts', 'vctk']

# Band count for the averaged A-weighted loudness conditioning
LOUDNESS_BANDS = 8

# Represent pitch as a learned per-bin embedding (vs a scalar channel)
PITCH_EMBEDDING = True

# Quantization resolution of the pitch contour
PITCH_BINS = 256

# Width of each learned pitch-bin vector
PITCH_EMBEDDING_SIZE = 64

# Phoneme categories in the posteriorgram
PPG_CHANNELS = 40

# Resampling mode when PPGs are stretched onto a new time grid.
# Available methods are ['linear', 'nearest']
PPG_INTERP_METHOD = 'linear'

# Offset mel inputs so their floor sits at zero
SPARSE_MELS = False

# PPG sparsification strategy.
# One of ['constant', 'percentile', 'topk', None]
SPARSE_PPG_METHOD = 'percentile'

# Sparsification strength: probability mass in [0, 1] for 'constant' and
# 'percentile'; an integer count > 0 for 'topk'
SPARSE_PPG_THRESHOLD = 0.85

# Global RNG seed (partitioning, augmentation, sampling, init)
RANDOM_SEED = 1234

# Condition the generator on spectrograms alone (MelGenerator mode)
SPECTROGRAM_ONLY = False

# Which dataset the training loop reads
TRAINING_DATASET = 'vctk'

# Place pitch-bin boundaries at dataset pitch quantiles rather than
# uniformly in log-Hz
VARIABLE_PITCH_BINS = True

# Decode the pitch posteriors with Viterbi (vs per-frame argmax)
VITERBI_DECODE_PITCH = True

# Periodicity cutoff for the voiced/unvoiced decision
VOICING_THRESHOLD = .1625


###############################################################################
# Directories
###############################################################################


# Base directory for all generated artifacts
ROOT_DIR = Path(
    os.environ.get('PROMONET_TPU_ROOT', Path(__file__).parent.parent.parent))

# Shipped assets: partitions, pitch statistics, augmentation ratios
ASSETS_DIR = Path(__file__).parent.parent / 'assets'

# Preprocessed-feature cache
CACHE_DIR = ROOT_DIR / 'data' / 'cache'

# Raw downloaded datasets
DATA_DIR = ROOT_DIR / 'data' / 'datasets'

# Evaluation outputs (objective + subjective listening material)
EVAL_DIR = ROOT_DIR / 'eval'

# Aggregated metric JSONs
RESULTS_DIR = ROOT_DIR / 'results'

# Training/adaptation run state (checkpoints, logs)
RUNS_DIR = ROOT_DIR / 'runs'


###############################################################################
# Discriminators
###############################################################################


# RVQGAN-style complex multi-band STFT discriminator
COMPLEX_MULTIBAND_DISCRIMINATOR = True

# HiFi-GAN multi-period waveform discriminator
MULTI_PERIOD_DISCRIMINATOR = True

# UnivNet multi-resolution magnitude-STFT discriminator
MULTI_RESOLUTION_DISCRIMINATOR = False

# MelGAN multi-scale waveform discriminator
MULTI_SCALE_DISCRIMINATOR = False


###############################################################################
# Evaluation
###############################################################################


# Panels drawn by the plotting module when none are requested
DEFAULT_PLOT_FEATURES = ['audio', 'loudness', 'pitch', 'periodicity', 'ppg']

# Per-frame error tolerances: a frame counts as wrong past these
ERROR_THRESHOLD_LOUDNESS = 6.  # decibels
ERROR_THRESHOLD_PERIODICITY = .1
ERROR_THRESHOLD_PITCH = 50.  # cents
ERROR_THRESHOLD_PPG = .1  # JSD

# Shift/stretch/scale factors exercised by offline evaluation
EVALUATION_RATIOS = [.717, 1.414]


###############################################################################
# Generator
###############################################################################


# Conditioning features fed to the generator
INPUT_FEATURES = ['loudness', 'pitch', 'periodicity', 'ppg']

# Negative-side slope of every leaky ReLU
LRELU_SLOPE = .1

# Vocoder backbone.
# One of ['cargan', 'fargan', 'hifigan', 'vocos', 'world'].
MODEL = 'hifigan'

# CARGAN: waveform lookback window feeding the autoregressive encoder
CARGAN_INPUT_SIZE = 2 * HOPSIZE

# CARGAN: encoder MLP width
CARGAN_HIDDEN_SIZE = 256

# CARGAN: channels the encoder contributes to the backbone input
CARGAN_OUTPUT_SIZE = 128

# FARGAN: inject ±1/254 noise during training
FARGAN_ADDITIVE_NOISE = True

# Adversary: use FARGAN's own spectral discriminator
FARGAN_DISCRIMINATOR = False

# FARGAN: normalize subframe gain
FARGAN_GAIN_NORMALIZATION = False

# FARGAN: frames of history available to the pitch-period lookback
FARGAN_PREVIOUS_FRAMES = 2  # frames

# FARGAN: autoregressive subdivisions of each frame
FARGAN_SUBFRAMES = 4  # subframes

# FARGAN: samples generated per subframe
FARGAN_SUBFRAME_SIZE = HOPSIZE // FARGAN_SUBFRAMES  # samples

# HiFi-GAN: parallel residual-branch kernel widths
HIFIGAN_RESBLOCK_KERNEL_SIZES = [3, 7, 11]

# HiFi-GAN: dilation schedule inside each residual branch
HIFIGAN_RESBLOCK_DILATION_SIZES = [[1, 3, 5], [1, 3, 5], [1, 3, 5]]

# HiFi-GAN: channel width entering the first upsampling stage
HIFIGAN_UPSAMPLE_INITIAL_SIZE = 512

# HiFi-GAN: transposed-conv kernel widths per stage
HIFIGAN_UPSAMPLE_KERNEL_SIZES = [16, 16, 4, 4]

# HiFi-GAN: temporal upsampling factor per stage (product = HOPSIZE)
HIFIGAN_UPSAMPLE_RATES = [8, 8, 2, 2]

# Width of the speaker identity vector
SPEAKER_CHANNELS = 256

# VITS latent width (kept for config compatibility)
VITS_CHANNELS = 192

# VITS prior-encoder width (kept for config compatibility)
VITS_PRIOR_CHANNELS = 768

# Vocos: ConvNeXt trunk width
VOCOS_CHANNELS = 512

# Vocos: ConvNeXt inverted-bottleneck width
VOCOS_POINTWISE_CHANNELS = 1536

# Vocos: ConvNeXt depth
VOCOS_LAYERS = 6

# Dimensionality of WavLM x-vectors
WAVLM_EMBEDDING_CHANNELS = 512

# Condition on WavLM x-vectors instead of a learned speaker table
ZERO_SHOT = False

# Swap in a different utterance's embedding of the same speaker
ZERO_SHOT_SHUFFLE = False


###############################################################################
# Logging
###############################################################################


# Checkpoint cadence
CHECKPOINT_INTERVAL = 20000  # steps

# Validation/TensorBoard cadence
EVALUATION_INTERVAL = 2500  # steps

# Validation batches consumed per logging pass
DEFAULT_EVALUATION_STEPS = 16

# Prosody-overlay figures rendered per logging pass
PLOT_EXAMPLES = 10


###############################################################################
# Losses
###############################################################################


# Hinge adversarial objective instead of least-squares
ADVERSARIAL_HINGE_LOSS = False

# Generator starts receiving adversarial gradient at this step
ADVERSARIAL_LOSS_START_STEP = 0

# Scale on the adversarial term
ADVERSARIAL_LOSS_WEIGHT = 1.

# Discriminator optimization begins at this step
DISCRIMINATOR_START_STEP = 0

# Scale on the feature-matching term
FEATURE_MATCHING_LOSS_WEIGHT = 1.

# Drop each discriminator's first activation from feature matching
FEATURE_MATCHING_OMIT_FIRST = False

# Scale on the KL term (VITS-style models; config compatibility)
KL_DIVERGENCE_LOSS_WEIGHT = 1.

# L1 mel-spectrogram reconstruction term
MEL_LOSS = True

# Scale on the mel term
MEL_LOSS_WEIGHT = 45.

# Mel loss summed over several window sizes
MULTI_MEL_LOSS = False

# Window sizes for the multi-scale mel variant
MULTI_MEL_LOSS_WINDOWS = [32, 64, 128, 256, 512, 1024, 2048]

# Normalized-correlation loss directly on waveforms
SIGNAL_LOSS = False

# Scale on the signal term
SIGNAL_LOSS_WEIGHT = .03

# Zero-floor the mels inside the mel loss
SPARSE_MEL_LOSS = False

# Multi-resolution spectral convergence term
SPECTRAL_CONVERGENCE_LOSS = False


###############################################################################
# Training
###############################################################################


# Batch size (global; sharded over the data axis of the device mesh)
BATCH_SIZE = 64

# Samples per training example (random crop; reflect-pad if short)
CHUNK_SIZE = 16384  # samples

# Inf-norm clip on generator gradients; None disables
GRADIENT_CLIP_GENERATOR = None

# Optimization budget
STEPS = 800000

# Additional steps when adapting to a new speaker
ADAPTATION_STEPS = 10000

# Host-side data-loading parallelism
NUM_WORKERS = 10

# Optimizer specification; resolved to an optax optimizer by the train layer.
# Matches the reference AdamW(lr=2e-4, betas=(.8, .99), eps=1e-9).
OPTIMIZER = {
    'name': 'adamw',
    'lr': 2e-4,
    'b1': .8,
    'b2': .99,
    'eps': 1e-9,
    'weight_decay': 1e-2}


###############################################################################
# TPU-specific parameters (no reference counterpart)
###############################################################################


# Computation dtype for model forward passes ('bfloat16' or 'float32').
# Replaces the reference's CUDA AMP autocast (no loss scaling needed on TPU).
PRECISION = 'bfloat16'

# Rematerialize conv activations in the training backward pass
# (jax.checkpoint). Trades ~25-35% extra compute for activation memory;
# disable when the batch fits HBM without it (single-chip v5e at the
# reference batch size does).
REMAT = True

# Fuse each HiFi-GAN dilated residual block into one VMEM-resident
# Pallas kernel at inference (ops/resblock.py). The unfused XLA chain
# re-reads activations from HBM per tap and is bandwidth-bound; the
# fused kernel is compute-bound for widths >= 64. None = auto (enabled
# on TPU backends; training always uses the unfused/remat path).
PALLAS_RESBLOCK = None

# Stride-1 conv lowering for programs traced inside the TRAINING step
# ('xla' or 'shifted'; None = inherit CONV_LOWERING/'shifted'). The
# shifted-matmul lowering (models/modules.py conv1d_shifted_dots) wins
# at inference batch sizes, but at the training batch its unrolled
# shifted slices materialize k activation copies: measured on the
# flagship shapes (scripts/lowering_ab.py, batch 64), the full GAN step
# is 663.7 ms / 386.9 GB HBM traffic with 'shifted' vs 478.0 ms /
# 156.4 GB with the native conv lowering — so training pins 'xla'.
TRAIN_CONV_LOWERING = 'xla'

# Device mesh axis sizes. None means "use all available devices" on the
# data axis. Training shards the batch over the 'data' axis; gradient
# all-reduce rides ICI via XLA sharding propagation.
MESH_SHAPE = None  # e.g. {'data': 8}

# Pad-to-bucket granularity (frames) for variable-length inference to
# bound XLA recompilation. Every rung is a multiple of 128 (the TPU
# lane width, so conv/matmul time tiles stay dense) and the ladder is
# geometric with ratio <= 4/3 above 512: a power-of-two-only ladder
# wasted up to ~2x generator compute on lengths just past a rung
# (e.g. the 10 s editing workload: 862 frames -> 1024 instead of 896,
# and its 1.414x-stretched output 610 -> 1024 instead of 640).
INFERENCE_FRAME_BUCKETS = [
    64, 128, 256, 384, 512, 640, 768, 896, 1024,
    1280, 1536, 1792, 2048, 2560, 3072, 3584, 4096]

# Optimizer steps fused into one dispatch when training from a
# device-resident corpus (lax.scan inside the compiled step; see
# train/core.py:steps_per_dispatch). None = auto (largest divisor ≤ 32
# of all step cadences). Amortizes per-dispatch latency on tunneled or
# contended TPU attachments.
STEPS_PER_DISPATCH = None

# Default generator checkpoint for synthesis when none is passed.
# None = resolve the latest checkpoint under RUNS_DIR/CONFIG (the
# zero-egress analogue of the reference's HuggingFace-hub default model,
# promonet/synthesize/core.py:234-237); random init if no run exists.
DEFAULT_CHECKPOINT = None

# Device-resident training data (data/resident.py): pack the whole
# preprocessed corpus into HBM once and sample crops on device inside
# the train step, instead of host-feeding batches. None = auto (on for
# TPU backends when the model trains on interpretable features).
# Essential when the chip sits behind a narrow interconnect.
RESIDENT_DATA = None

# Speaker count of the zero-egress formant-synthesis corpus
# (data/synthetic.py); used when TRAINING_DATASET == 'synthetic'
SYNTHETIC_SPEAKERS = 24

# Pitch estimation front-end: 'dsp' (normalized cross-correlation; no
# pretrained weights needed) or 'cnn' (FCNF0-style learned estimator;
# loads weights from ASSETS_DIR/checkpoints/pitch when present).
# Replaces the reference's external penn dependency — penn itself is a
# trained CNN (promonet/preprocess/core.py:64-86), so 'cnn' is the
# faithful default. The shipped checkpoint trains on the formant corpus
# plus domain-randomized tones; accuracy parity with 'dsp' in-domain
# and large wins out of domain are gated by
# scripts/pitch_domain_check.py (octave jumps: 3.2 vs 1200 cents
# median), at ~18x the throughput.
PITCH_ESTIMATOR = 'cnn'
