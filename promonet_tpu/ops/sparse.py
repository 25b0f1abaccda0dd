"""Sparse phonetic posteriorgram utilities.

JAX replacements for the `ppgs` package utilities the reference uses:
sparsification (promonet/model/generator.py:139-147) and Jensen-Shannon
pronunciation distance (promonet/evaluate/metrics.py:296-300).

PPGs have shape (..., C, T): a categorical distribution over C phonemes per
frame.
"""
import jax.numpy as jnp


def sparsify(ppg, method='percentile', threshold=0.85):
    """Sparsify a phonetic posteriorgram, preserving the distribution

    Methods
        constant: zero probabilities below `threshold`
        percentile: per-frame threshold at quantile `threshold`
        topk: keep the `threshold` largest probabilities per frame

    The surviving probabilities are renormalized to sum to one.
    """
    if method is None:
        return ppg
    if method == 'constant':
        mask = ppg >= threshold
    elif method == 'percentile':
        cutoff = jnp.quantile(ppg, threshold, axis=-2, keepdims=True)
        mask = ppg >= cutoff
    elif method == 'topk':
        k = int(threshold)
        kth = jnp.sort(ppg, axis=-2)[..., -k:-k + 1 or None, :][..., 0:1, :]
        mask = ppg >= kth
    else:
        raise ValueError(f'Sparsification method {method} is not defined')
    sparse = jnp.where(mask, ppg, 0.)
    total = jnp.clip(sparse.sum(axis=-2, keepdims=True), 1e-8)
    return sparse / total


def jensen_shannon(p, q, axis=-2, eps=1e-8):
    """Jensen-Shannon distance between per-frame distributions, in [0, 1]

    Base-2 logs so the maximum divergence is 1; returns the square root
    (a metric), matching the ppgs distance used for the pronunciation
    error (promonet/evaluate/metrics.py:296-300).
    """
    p = p / jnp.clip(p.sum(axis=axis, keepdims=True), eps)
    q = q / jnp.clip(q.sum(axis=axis, keepdims=True), eps)
    m = 0.5 * (p + q)

    def kl(a, b):
        return jnp.sum(
            jnp.where(a > 0, a * (jnp.log2(a + eps) - jnp.log2(b + eps)), 0.),
            axis=axis)

    jsd = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return jnp.sqrt(jnp.clip(jsd, 0., 1.))
