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
import functools

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
# Large-state decode: on-the-fly log-frequency transition
###############################################################################


def logfreq_transition_dense(frequencies, locality=3.5, dtype=jnp.float32):
    """The harmonics transition as an explicit (N, N) log matrix

    transition[i, j] ∝ max(0, 1 - locality * |log2 fi - log2 fj|),
    row-normalized, floored at 1e-12 before the log — exactly the matrix
    built at preprocess/harmonics.py:128-134 (reference:
    promonet/preprocess/harmonics.py:230-239). Used by the scan fallback
    and the brute-force tests.
    """
    lf = np.log2(np.maximum(np.asarray(frequencies, np.float64), 1e-30))
    tri = np.maximum(0., 1. - locality * np.abs(lf[:, None] - lf[None, :]))
    tri = tri / np.maximum(tri.sum(axis=1, keepdims=True), 1e-30)
    return jnp.asarray(np.log(np.maximum(tri, 1e-12)), dtype=dtype)


def decode_logfreq(
    observation,
    frequencies,
    initial,
    locality=3.5,
    use_pallas=None,
    time_chunk=64,
    tile=128,
):
    """Viterbi decode under the log-frequency locality transition.

    For state spaces like the 2049-bin harmonics decode
    (promonet/preprocess/harmonics.py:215-297 via torbi), the (N, N)
    transition matrix (16.8 MB at N=2049) cannot live in VMEM. But the
    matrix is a pure function of the (static) frequency axis:

        T[i, j] = log(max(tri_ij, 1e-12)),
        tri_ij = max(0, 1 - locality*|log2 fi - log2 fj|) / rownorm_i

    so the Pallas kernel materializes nothing: each (source-tile,
    dest-tile) block of scores is computed on the fly in registers from
    two (tile,) slices of log-frequencies. Tile pairs that are entirely
    out of band (tri == 0 everywhere) are skipped using a feasibility
    pattern computed at trace time from the static frequencies — for the
    linear STFT axis that prunes ~2/3 of the blocks. Out-of-band moves
    are not impossible, only floored at log(1e-12) (the reference's clip
    semantics), so every dest state also considers `max_i alpha_i +
    log(1e-12)` — an O(N) reduction — keeping the result exactly equal
    to the dense decode.

    Frames stream through a sequential grid in `time_chunk` blocks with
    the alpha vector persisting in VMEM scratch; predecessor indices and
    per-frame alphas stream out to HBM; backtrace reuses the scan.

    Arguments
        observation: (T, N) log-probability frames
        frequencies: (N,) static frequency axis in Hz
        initial: (N,) log initial distribution
    Returns
        path: (T,) int32
    """
    num_frames, num_states = observation.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if not use_pallas or num_frames <= 1:
        transition = logfreq_transition_dense(frequencies, locality)
        indices, final_alpha = _forward_scan(
            observation, transition, initial)
        return _backtrace(indices, final_alpha)

    frequencies = np.asarray(frequencies, np.float64)
    lf = np.log2(np.maximum(frequencies, 1e-30))
    tri = np.maximum(0., 1. - locality * np.abs(lf[:, None] - lf[None, :]))
    rownorm = np.maximum(tri.sum(axis=1), 1e-30)

    # Pad states to the lane width
    padded = ((num_states + tile - 1) // tile) * tile
    pad = padded - num_states
    lf_pad = np.pad(lf, (0, pad), constant_values=1e9).astype(np.float32)
    rownorm_pad = np.pad(
        rownorm, (0, pad), constant_values=1.).astype(np.float32)

    # Trace-time feasibility: which (source, dest) tile pairs contain any
    # in-band entry
    num_tiles = padded // tile
    in_band = np.abs(lf[:, None] - lf[None, :]) < 1. / locality
    feasible = []
    for j_tile in range(num_tiles):
        j0, j1 = j_tile * tile, min((j_tile + 1) * tile, num_states)
        sources = []
        for i_tile in range(num_tiles):
            i0, i1 = i_tile * tile, min((i_tile + 1) * tile, num_states)
            if j0 < num_states and i0 < num_states and \
                    in_band[i0:i1, j0:j1].any():
                sources.append(i_tile)
        feasible.append(tuple(sources))
    feasible = tuple(feasible)

    # Pad frames to the time chunk
    chunks = (num_frames + time_chunk - 1) // time_chunk
    frame_pad = chunks * time_chunk - num_frames
    observation = jnp.pad(
        jnp.pad(
            observation.astype(jnp.float32),
            ((0, 0), (0, pad)),
            constant_values=NEG_INF),
        ((0, frame_pad), (0, 0)))
    initial = jnp.pad(
        initial.astype(jnp.float32), (0, pad), constant_values=NEG_INF)

    indices, alphas = _logfreq_forward_pallas(
        observation,
        jnp.asarray(lf_pad).reshape(1, -1),
        jnp.asarray(rownorm_pad).reshape(1, -1),
        initial.reshape(1, -1),
        float(locality),
        feasible,
        time_chunk,
        tile)
    indices = indices[:num_frames, :num_states]
    final_alpha = alphas[num_frames - 1, :num_states]
    return _backtrace(indices, final_alpha)


def _logfreq_forward_kernel(
    locality, feasible, tile, obs_ref, lf_ref, rownorm_ref, init_ref,
    idx_ref, alpha_out_ref, alpha_ref
):
    """One time-chunk of the on-the-fly-transition forward pass

    Refs
        obs_ref: (Tc, N) VMEM in — this chunk's observations
        lf_ref / rownorm_ref / init_ref: (1, N) VMEM in
        idx_ref: (Tc, N) int32 VMEM out — argmax predecessors
        alpha_out_ref: (Tc, N) VMEM out — per-frame alphas
        alpha_ref: (1, N) VMEM scratch persisting across grid steps
    """
    chunk = pl.program_id(0)
    chunk_frames, num_states = obs_ref.shape
    num_tiles = num_states // tile
    floor = float(np.log(1e-12))

    @pl.when(chunk == 0)
    def _():
        alpha_ref[:] = init_ref[:] + obs_ref[0:1, :]
        idx_ref[0:1, :] = jax.lax.broadcasted_iota(
            jnp.int32, (1, num_states), 1)
        alpha_out_ref[0:1, :] = alpha_ref[:]

    def step(t, _):
        alpha = alpha_ref[:]  # (1, N)

        # Out-of-band floor candidate: best alpha anywhere + log(1e-12)
        global_best = jnp.max(alpha)
        global_arg = jnp.argmax(alpha[0, :]).astype(jnp.int32)

        for j_tile in range(num_tiles):
            j0 = j_tile * tile
            lf_j = lf_ref[0:1, j0:j0 + tile]  # (1, tile)
            best = jnp.full((1, tile), global_best + floor, jnp.float32)
            arg = jnp.full((1, tile), global_arg, jnp.int32)
            for i_tile in feasible[j_tile]:
                i0 = i_tile * tile
                alpha_i = alpha[0:1, i0:i0 + tile]
                lf_i = lf_ref[0:1, i0:i0 + tile]
                norm_i = rownorm_ref[0:1, i0:i0 + tile]
                # (tile_i, tile_j) block of log-transition, in registers
                tri = jnp.maximum(
                    0.,
                    1. - locality * jnp.abs(
                        lf_i.reshape(tile, 1) - lf_j.reshape(1, tile)))
                log_t = jnp.log(
                    jnp.maximum(tri / norm_i.reshape(tile, 1), 1e-12))
                scores = alpha_i.reshape(tile, 1) + log_t
                block_best = jnp.max(scores, axis=0)
                block_arg = (
                    jnp.argmax(scores, axis=0).astype(jnp.int32) +
                    i_tile * tile)
                take = block_best > best[0, :]
                best = jnp.where(take, block_best, best[0, :]).reshape(
                    1, tile)
                arg = jnp.where(take, block_arg, arg[0, :]).reshape(
                    1, tile)
            idx_ref[pl.ds(t, 1), j0:j0 + tile] = arg
            alpha_out_ref[pl.ds(t, 1), j0:j0 + tile] = (
                best + obs_ref[pl.ds(t, 1), j0:j0 + tile])

        alpha_ref[:] = alpha_out_ref[pl.ds(t, 1), :]
        return 0

    start = jax.lax.select(chunk == 0, 1, 0)
    jax.lax.fori_loop(start, chunk_frames, step, 0)


def _logfreq_forward_pallas(
    observation, lf, rownorm, initial, locality, feasible, time_chunk, tile
):
    num_frames, num_states = observation.shape
    kernel = functools.partial(
        _logfreq_forward_kernel, locality, feasible, tile)
    grid = num_frames // time_chunk
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((num_frames, num_states), jnp.int32),
            jax.ShapeDtypeStruct((num_frames, num_states), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (time_chunk, num_states), lambda c: (c, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_states), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_states), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_states), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_chunk, num_states), lambda c: (c, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_chunk, num_states), lambda c: (c, 0),
                memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, num_states), jnp.float32),
        ],
    )(observation, lf, rownorm, initial)


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
