"""Viterbi decoding on TPU.

TPU-native replacement for `torbi` (the CUDA Viterbi extension the
reference uses for pitch decoding at promonet/preprocess/core.py:65-71 and
harmonic decoding at promonet/preprocess/harmonics.py:215-297).

The Pallas kernel runs the ENTIRE decode on-chip in one dispatch: the
max-product forward pass keeps the alpha vector and transition matrix
resident in VMEM, stores per-frame argmax predecessors, then backtraces
in-kernel with a reverse loop — no host round-trips (the remote-dispatch
latency of a chained scan would otherwise dominate). A pure-JAX
`lax.scan` fallback serves CPU tests and large state spaces.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# VMEM budget check: obs (T,N) + indices (T,N) + transition (N,N) must fit
# on-chip (~16 MB VMEM per core; leave headroom)
MAX_PALLAS_VMEM_BYTES = 12 * 1024 * 1024


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
    num_frames, num_states = observation.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    vmem = 4 * (2 * num_frames * num_states + num_states * num_states)
    if use_pallas and num_frames > 1 and vmem <= MAX_PALLAS_VMEM_BYTES:
        return _decode_pallas(observation, transition, initial)
    indices, final_alpha = _forward_scan(observation, transition, initial)
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
# Forward pass: pure-JAX scan (CPU fallback / reference)
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


###############################################################################
# Fused Pallas kernel: forward + backtrace in one dispatch
###############################################################################


def _decode_kernel(obs_ref, trans_ref, init_ref, path_ref, idx_ref, alpha_ref):
    """Full Viterbi decode on-chip

    Refs
        obs_ref: (T, N) VMEM in — per-frame log-probs
        trans_ref: (N, N) VMEM in
        init_ref: (1, N) VMEM in
        path_ref: (T, 1) int32 VMEM out — decoded state path
        idx_ref: (T, N) int32 VMEM scratch — argmax predecessors
        alpha_ref: (1, N) VMEM scratch
    """
    num_frames, num_states = obs_ref.shape

    # Forward pass
    alpha_ref[:] = init_ref[:] + obs_ref[0:1, :]

    def forward(t, _):
        scores = alpha_ref[:].reshape(num_states, 1) + trans_ref[:]
        best = jnp.max(scores, axis=0, keepdims=True)
        arg = jnp.argmax(scores, axis=0).astype(jnp.int32)
        idx_ref[pl.ds(t, 1), :] = arg.reshape(1, num_states)
        alpha_ref[:] = best + obs_ref[pl.ds(t, 1), :]
        return 0

    jax.lax.fori_loop(1, num_frames, forward, 0)

    # Backtrace: select predecessors with a one-hot reduction (dynamic
    # lane-index gathers are not TPU-friendly)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, num_states), 1)
    last = jnp.argmax(alpha_ref[:]).astype(jnp.int32)
    path_ref[pl.ds(num_frames - 1, 1), :] = jnp.full((1, 1), last, jnp.int32)

    def backward(i, state):
        t = num_frames - 1 - i
        row = idx_ref[pl.ds(t, 1), :]
        prev = jnp.sum(jnp.where(lanes == state, row, 0))
        path_ref[pl.ds(t - 1, 1), :] = jnp.full((1, 1), prev, jnp.int32)
        return prev

    jax.lax.fori_loop(0, num_frames - 1, backward, last)


@jax.jit
def _decode_pallas(observation, transition, initial):
    num_frames, num_states = observation.shape
    path = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((num_frames, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((num_frames, num_states), jnp.int32),
            pltpu.VMEM((1, num_states), observation.dtype),
        ],
    )(observation, transition, initial.reshape(1, -1))
    return path[:, 0]
