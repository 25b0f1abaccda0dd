"""Benchmark overlay (applied after the flagship run config).

The flagship run pins PITCH_ESTIMATOR='dsp' because its on-disk corpus
features were extracted with the DSP front-end (see
configs/synthetic.py). The benchmark measures the framework as shipped,
so it restores the default CNN front-end — the estimators agree to
within ~1 pitch-embedding bin on speech, and generator compatibility is
unaffected (the checkpoint check is structural).
"""
MODULE = 'promonet'

PITCH_ESTIMATOR = 'cnn'
