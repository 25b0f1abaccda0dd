"""Fused HiFi-GAN residual block as a Pallas TPU kernel.

One dilated residual Block (promonet/model/hifigan.py:157-210; ours:
models/hifigan.py Block) is a chain of six stride-1 convolutions —
[lrelu → conv(k, d) → lrelu → conv(k, 1) → residual] per dilation d —
over (B, T, C) activations. Lowered one conv at a time, every tap
re-reads the activation from HBM and re-writes fp32 partials, so the
whole block runs at an arithmetic intensity of ~C/3 flops/byte: far
below the ~240 flops/byte a v5e needs to feed its MXU (round-2 MFU was
13.7%).

This kernel runs the ENTIRE six-conv chain for a time tile while the
tile lives in VMEM: HBM sees one read of the input tile (+halo) and one
write of the output tile, raising the intensity to ~1.5*k*C flops/byte,
i.e. compute-bound for C >= 64. Weights for all six convolutions stay
resident in VMEM across grid steps (constant index map).

Halo handling: the tile lives centered in a scratch buffer padded by
PMAX = (k-1)/2 * max(dilation) rows of zeros on each side, so every
'same' convolution is a sum of k statically-sliced loads — no rotates
(Mosaic has no sub-32-bit rotate) and no wraparound. Each conv corrupts
at most (k-1)/2*d rows at the buffer ends; the cumulative corruption
depth over the chain is exactly HALO = (k-1)/2 * sum(d+1), which the
tile overlap budgets for. The host pads the sequence with zeros,
reproducing the reference's zero 'same' padding at utterance
boundaries, and out-of-sequence rows are re-zeroed after every conv
(the reference zero-pads each convolution independently).

The op is differentiable via jax.custom_vjp: the backward pass replays
the identical plain-XLA chain (conv1d_shifted_dots) and pulls the
cotangent through it, so training numerics match the unfused path.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def block_halo(kernel_size, dilations):
    """Cumulative 'same'-conv fringe depth of the six-conv chain,
    rounded up to the bf16 sublane tile so every VMEM offset the kernel
    touches is 16-aligned (Mosaic requires provable tile divisibility)
    """
    exact = (kernel_size - 1) // 2 * sum(d + 1 for d in dilations)
    return -(-exact // 16) * 16


def _scratch_pad(kernel_size, dilations):
    """Zero-fringe width of the scratch buffers, 16-aligned"""
    exact = (kernel_size - 1) // 2 * max(dilations)
    return -(-exact // 16) * 16


def default_tile(channels):
    """Time-tile length balancing VMEM (weights + 2 buffers) per width"""
    return max(512, min(4096, 512 * (256 // max(channels, 32))))


def reference_block(x, weights, biases, dilations, slope, dtype):
    """The identical chain in plain XLA (parity target + backward pass)

    Arguments
        x: (B, T, C)
        weights: (2 * len(dilations), k, C, C) effective conv kernels
        biases: (2 * len(dilations), C)
    """
    from ..models.modules import conv1d_shifted_dots
    k = weights.shape[1]
    x = x.astype(dtype)
    for i, dilation in enumerate(dilations):
        t = _leaky(x, slope)
        t = conv1d_shifted_dots(
            t, weights[2 * i], dilation, (k - 1) // 2 * dilation, dtype)
        t = t + biases[2 * i].astype(dtype)
        t = _leaky(t, slope)
        t = conv1d_shifted_dots(t, weights[2 * i + 1], 1, (k - 1) // 2, dtype)
        t = t + biases[2 * i + 1].astype(dtype)
        x = x + t
    return x


def _kernel(
    x_any,
    w_ref,
    b_ref,
    o_ref,
    cur,
    tmp,
    sem,
    *,
    kernel_size,
    dilations,
    slope,
    tile,
    halo,
    frames
):
    """Six-conv chain for one (batch, time-tile) grid cell

    Buffer layout: `cur`/`tmp` are (PMAX + length + PMAX, C) VMEM
    scratch; the live rows sit at [PMAX, PMAX + length) and the fringes
    hold zeros, so every 'same' conv is a sum of k static slices. All
    matmuls accumulate fp32 on the MXU and cast back at the bias add,
    matching conv1d_shifted_dots.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    k = kernel_size
    length = tile + 2 * halo
    pmax = _scratch_pad(k, dilations)

    cur[:] = jnp.zeros_like(cur)
    copy = pltpu.make_async_copy(
        x_any.at[b, pl.ds(i * tile, length), :],
        cur.at[pl.ds(pmax, length), :],
        sem)
    copy.start()
    tmp[:] = jnp.zeros_like(tmp)
    copy.wait()

    dtype = cur.dtype

    # Rows outside the real sequence must read as zero at EVERY conv
    # (the reference zero-pads each convolution independently); mask
    # them after each conv so the bias never leaks into the padding.
    # Arithmetic masking and max-form leaky-relu avoid vector compares
    # and selects on narrow types, which Mosaic does not lower on v5e.
    position = jax.lax.broadcasted_iota(
        jnp.int32, (length, 1), 0) + i * tile - halo
    in_sequence = (
        (position >= 0) & (position < frames)).astype(dtype)

    def lrelu(x):
        # == where(x >= 0, x, slope * x) for 0 <= slope < 1
        return jnp.maximum(x, slope * x)

    def conv(src, index, dilation):
        """Σ_j src[taps_j] @ W[j], masked; src fringe rows must be 0"""
        pad = (k - 1) // 2 * dilation
        acc = None
        for j in range(k):
            tap = src[pmax - pad + j * dilation:][:length]
            part = jax.lax.dot_general(
                tap,
                w_ref[index, j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        out = acc.astype(dtype) + b_ref[index][None, :].astype(dtype)
        return out * in_sequence

    for n, dilation in enumerate(dilations):
        # tmp <- lrelu(cur) everywhere (fringe stays 0: lrelu(0) = 0)
        tmp[:] = lrelu(cur[:])
        t = conv(tmp[:], 2 * n, dilation)
        # center <- lrelu(t); fringe untouched (still 0)
        tmp[pl.ds(pmax, length), :] = lrelu(t)
        t = conv(tmp[:], 2 * n + 1, 1)
        cur[pl.ds(pmax, length), :] = cur[pl.ds(pmax, length), :] + t

    o_ref[0] = cur[pmax + halo:pmax + halo + tile]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_block(x, weights, biases, dilations, slope):
    """Fused dilated residual block (HiFi-GAN Block semantics)

    Arguments
        x: (B, T, C) activations
        weights: (2 * len(dilations), k, C, C) effective conv kernels
        biases: (2 * len(dilations), C)
        dilations: static dilation schedule, e.g. (1, 3, 5)
        slope: leaky-relu slope

    Returns
        (B, T, C), same dtype as the compute dtype (bfloat16 on TPU)
    """
    return _forward(x, weights, biases, dilations, slope)


def lane_pack(x, weights, biases):
    """Pack g = 128/C batch elements into the lane dimension.

    Narrow stages (C in {32, 64}) waste 128-lane VMEM tiles, and the
    fallback XLA-conv lowering at serving batch sizes triggers the
    space-to-batch rewrite (measured round 5, batch 4 at 10 s audio:
    40% of generator device time in layout copies and another ~25% in
    unfused elementwise ops on (4, 220672, 32) activations). Packing
    (B, T, C) as (B/g, T, g*C) with BLOCK-DIAGONAL weights runs the
    same fused kernel at full lane width: each batch element's channels
    occupy a disjoint lane block, so every per-tap matmul computes g
    independent C×C contractions and batch elements never mix.

    Returns (x, weights, biases, unpack) with lane width g*C == 128.
    """
    batch, frames, channels = x.shape
    g = 128 // channels
    s, k = weights.shape[0], weights.shape[1]
    xp = x.reshape(batch // g, g, frames, channels)
    xp = xp.transpose(0, 2, 1, 3).reshape(batch // g, frames, g * channels)
    eye = jnp.eye(g, dtype=weights.dtype)
    wp = jnp.einsum('ab,skic->skaibc', eye, weights).reshape(
        s, k, g * channels, g * channels)
    bp = jnp.tile(biases, (1, g))

    def unpack(out):
        out = out.reshape(batch // g, frames, g, channels)
        return out.transpose(0, 2, 1, 3).reshape(batch, frames, channels)

    return xp, wp, bp, unpack


def _forward(x, weights, biases, dilations, slope):
    import jax as _jax
    batch, frames, channels = x.shape
    tile = default_tile(channels)
    if _jax.default_backend() != 'tpu' or frames <= tile:
        # Non-TPU backends (tests, export) and single-tile sizes use
        # the plain chain — it is the semantics reference, already one
        # XLA fusion at small sizes
        return reference_block(
            x, weights, biases, dilations, slope, x.dtype)
    if channels % 128:
        # Mosaic requires 128-lane alignment for the HBM->VMEM tile DMA
        if 128 % channels == 0 and batch % (128 // channels) == 0:
            xp, wp, bp, unpack = lane_pack(x, weights, biases)
            return unpack(_pallas_forward(xp, wp, bp, dilations, slope))
        return reference_block(
            x, weights, biases, dilations, slope, x.dtype)
    return _pallas_forward(x, weights, biases, dilations, slope)


def _pallas_forward(
    x, weights, biases, dilations, slope, interpret=False, tile=None
):
    batch, frames, channels = x.shape
    k = weights.shape[1]
    halo = block_halo(k, dilations)
    if tile is None:
        tile = default_tile(channels)
    num_tiles = -(-frames // tile)

    padded = jnp.pad(
        x, ((0, 0), (halo, halo + num_tiles * tile - frames), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            kernel_size=k,
            dilations=tuple(dilations),
            slope=slope,
            tile=tile,
            halo=halo,
            frames=frames),
        grid=(batch, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, channels),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_tiles * tile, channels), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (tile + 2 * halo + 2 * _scratch_pad(k, dilations),
                 channels),
                x.dtype),
            pltpu.VMEM(
                (tile + 2 * halo + 2 * _scratch_pad(k, dilations),
                 channels),
                x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded, weights, biases)
    return out[:, :frames]


def _fwd(x, weights, biases, dilations, slope):
    return _forward(x, weights, biases, dilations, slope), \
        (x, weights, biases)


def _bwd(dilations, slope, residuals, cotangent):
    x, weights, biases = residuals
    _, vjp = jax.vjp(
        lambda x_, w_, b_: reference_block(
            x_, w_, b_, dilations, slope, x.dtype),
        x, weights, biases)
    dx, dw, db = vjp(cotangent.astype(x.dtype))
    return dx, dw, db


fused_block.defvjp(_fwd, _bwd)
