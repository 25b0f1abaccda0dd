"""Viterbi decoding on TPU.

TPU-native replacement for `torbi` (the CUDA Viterbi extension the
reference uses for pitch decoding at promonet/preprocess/core.py:65-71 and
harmonic decoding at promonet/preprocess/harmonics.py:215-297).

Two implementations of the max-product forward pass:
  * a Pallas kernel that keeps the alpha vector and transition matrix
    resident in VMEM and streams only the per-frame argmax indices out —
    the sequential scan runs entirely on-chip;
  * a pure-JAX `lax.scan` fallback used on CPU (tests) and as a reference.

Backtrace is a cheap reverse `lax.scan` over the stored argmax indices.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


###############################################################################
# Public API
###############################################################################


def decode(observation, transition, initial, use_pallas=None):
    """Viterbi-decode a sequence of log-probability frames

    Arguments
        observation: (T, N) per-frame log-probabilities
        transition: (N, N) log transition matrix; transition[i, j] is the
            log-probability of moving from state i to state j
        initial: (N,) log initial distribution
        use_pallas: force kernel choice; default = True on TPU backends

    Returns
        path: (T,) int32 state indices
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    forward = _forward_pallas if use_pallas else _forward_scan
    indices, final_alpha = forward(observation, transition, initial)
    return _backtrace(indices, final_alpha)


def from_probabilities(observation, transition=None, initial=None, **kwargs):
    """torbi-style entry point taking probabilities instead of logs"""
    num_states = observation.shape[-1]
    if transition is None:
        transition = jnp.full(
            (num_states, num_states), 1. / num_states, observation.dtype)
    if initial is None:
        initial = jnp.full((num_states,), 1. / num_states, observation.dtype)
    return decode(
        jnp.log(jnp.clip(observation, 1e-12)),
        jnp.log(jnp.clip(transition, 1e-12)),
        jnp.log(jnp.clip(initial, 1e-12)),
        **kwargs)


def triangular_transition(num_states, width, dtype=jnp.float32):
    """Local triangular transition matrix in log space

    transition[i, j] ∝ max(0, width - |i - j|), row-normalized. This is the
    standard local-smoothness prior used for pitch decoding.
    """
    idx = np.arange(num_states)
    tri = np.maximum(0., width - np.abs(idx[:, None] - idx[None, :]))
    tri = tri / tri.sum(axis=1, keepdims=True)
    return jnp.asarray(
        np.where(tri > 0, np.log(np.maximum(tri, 1e-12)), NEG_INF),
        dtype=dtype)


###############################################################################
# Forward pass: pure-JAX scan
###############################################################################


def _forward_scan(observation, transition, initial):
    """lax.scan forward pass; returns ((T, N) argmax indices, final alpha)"""

    def step(alpha, obs_t):
        scores = alpha[:, None] + transition  # (from, to)
        best = jnp.max(scores, axis=0)
        arg = jnp.argmax(scores, axis=0).astype(jnp.int32)
        return best + obs_t, arg

    alpha0 = initial + observation[0]
    final_alpha, indices = jax.lax.scan(step, alpha0, observation[1:])
    # Prepend a dummy row for t=0 so indices[t] is the predecessor of t
    indices = jnp.concatenate(
        [jnp.zeros((1, observation.shape[1]), jnp.int32), indices])
    return indices, final_alpha


###############################################################################
# Forward pass: Pallas kernel
###############################################################################


def _forward_kernel(obs_ref, trans_ref, init_ref, idx_ref, alpha_ref):
    """Sequential Viterbi forward pass, alpha resident in VMEM

    Refs
        obs_ref: (T, N) VMEM
        trans_ref: (N, N) VMEM
        init_ref: (1, N) VMEM
        idx_ref: (T, N) int32 VMEM out
        alpha_ref: (1, N) VMEM out (final alpha)
    """
    num_frames = obs_ref.shape[0]

    alpha_ref[:] = init_ref[:] + obs_ref[0:1, :]
    idx_ref[0:1, :] = jnp.zeros_like(idx_ref[0:1, :])

    def body(t, _):
        # (from, to) scores; alpha broadcast down columns
        scores = alpha_ref[:].reshape(-1, 1) + trans_ref[:]
        best = jnp.max(scores, axis=0, keepdims=True)
        arg = jnp.argmax(scores, axis=0).astype(jnp.int32)
        idx_ref[pl.ds(t, 1), :] = arg.reshape(1, -1)
        alpha_ref[:] = best + obs_ref[pl.ds(t, 1), :]
        return 0

    jax.lax.fori_loop(1, num_frames, body, 0)


def _forward_pallas(observation, transition, initial):
    num_frames, num_states = observation.shape
    indices, alpha = pl.pallas_call(
        _forward_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_frames, num_states), jnp.int32),
            jax.ShapeDtypeStruct((1, num_states), observation.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(observation, transition, initial.reshape(1, -1))
    return indices, alpha[0]


###############################################################################
# Backtrace
###############################################################################


def _backtrace(indices, final_alpha):
    """Follow stored argmax indices backward from the best final state"""
    last = jnp.argmax(final_alpha).astype(jnp.int32)
    if indices.shape[0] == 1:
        return last[None]

    def step(state, idx_t):
        # emit the state at time t, carry its predecessor
        return idx_t[state], state

    first, rest = jax.lax.scan(step, last, indices[1:], reverse=True)
    return jnp.concatenate([first[None], rest])
