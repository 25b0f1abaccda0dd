"""Out-of-domain pitch-estimator validation.

Compares the DSP (NCC) and CNN front-ends on synthetic signals whose F0
is known exactly but which lie OUTSIDE the speech-corpus training domain
(pure glides across the full candidate range, vibrato, octave jumps).
Guards the PITCH_ESTIMATOR='cnn' default: a front-end that only works on
modal-register speech must not ship as the default.

Usage: python scripts/pitch_domain_check.py
Prints one row per (front-end, signal): median cents error on voiced
frames, fraction within 50 cents (the reference frame-error threshold,
/root/reference/promonet/config/defaults.py:198), octave-error rate.
"""
import sys

import numpy as np


def signals(sample_rate, seconds=4.0):
    """(name, audio (1,T) float32, f0-per-sample) triples"""
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    out = []

    def harmonic(f0):
        phase = 2 * np.pi * np.cumsum(f0) / sample_rate
        audio = np.zeros_like(t)
        for k, amp in ((1, 1.0), (2, 0.5), (3, 0.3), (4, 0.15)):
            audio += amp * np.sin(k * phase) * ((k * f0) < sample_rate / 2)
        return (audio / np.abs(audio).max() * 0.6).astype(np.float32)

    # Vibrato around 200 Hz (bench signal territory)
    f0 = 200 * 2 ** (0.05 * np.sin(2 * np.pi * 5.0 * t))
    out.append(('bench_vibrato', harmonic(f0), f0))

    # Low glide 80 -> 140 Hz
    f0 = np.exp(np.linspace(np.log(80), np.log(140), len(t)))
    out.append(('low_glide', harmonic(f0), f0))

    # High glide 500 -> 315 Hz (the round-2 CNN failure case)
    f0 = np.exp(np.linspace(np.log(500), np.log(315), len(t)))
    out.append(('high_glide', harmonic(f0), f0))

    # Octave step jumps 110/220/440 Hz, 0.5 s holds
    steps = np.array([110., 220., 440., 220., 110., 440., 220., 110.])
    f0 = np.repeat(steps, int(0.5 * sample_rate))[:len(t)]
    out.append(('step_jumps', harmonic(f0), f0))

    return out


def evaluate(estimator):
    import promonet_tpu
    from promonet_tpu.preprocess import pitch as pitch_module

    promonet_tpu.PITCH_ESTIMATOR = estimator
    sample_rate = promonet_tpu.SAMPLE_RATE
    hopsize = promonet_tpu.HOPSIZE
    rows = []
    for name, audio, f0 in signals(sample_rate):
        est, periodicity = (
            np.asarray(x)[0] for x in pitch_module.from_audio(
                audio[None], sample_rate))
        frames = len(est)
        true = f0[:frames * hopsize].reshape(frames, hopsize).mean(axis=-1)
        cents = 1200 * np.abs(np.log2(est / true))
        rows.append((
            name,
            round(float(np.median(cents)), 1),
            round(float((cents < 50).mean()), 3),
            round(float((np.abs(cents - 1200) < 100).mean()), 4),
        ))
    return rows


def main():
    results = {}
    for estimator in ('dsp', 'cnn'):
        results[estimator] = evaluate(estimator)
        print(estimator, results[estimator], flush=True)

    # Gate: the CNN must be within 2x of DSP's median cents (and under
    # the 50-cent threshold) on every continuous-pitch signal.
    ok = True
    for (name, d_med, d_in, _), (_, c_med, c_in, c_oct) in zip(
        results['dsp'], results['cnn']
    ):
        if name == 'step_jumps':
            continue  # both decoders smooth across octave jumps
        if c_med > max(2 * d_med, 50) or c_oct > 0.02:
            print(f'FAIL {name}: cnn median {c_med} vs dsp {d_med}, '
                  f'octave rate {c_oct}')
            ok = False
    print('OK' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
