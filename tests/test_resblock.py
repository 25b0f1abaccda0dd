"""Fused Pallas residual block: parity against the plain-XLA chain.

The kernel (ops/resblock.py) must reproduce the unfused Block semantics
(models/hifigan.py) — same parameter tree, same bf16 numerics — since
inference flips to it transparently on TPU backends.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promonet_tpu.ops import resblock


def _random_block(key, channels, kernel_size, dilations, dtype):
    kw, kb, kx = jax.random.split(key, 3)
    n = 2 * len(dilations)
    weights = 0.3 * jax.random.normal(
        kw, (n, kernel_size, channels, channels), jnp.float32)
    biases = 0.1 * jax.random.normal(kb, (n, channels), jnp.float32)
    return weights.astype(dtype), biases.astype(jnp.float32)


@pytest.mark.parametrize('kernel_size,dilations', [
    (3, (1, 3, 5)),
    (11, (1, 3, 5)),
])
def test_pallas_kernel_matches_reference(kernel_size, dilations):
    """Interpret-mode kernel vs the plain chain, multi-tile + edge tile"""
    channels, frames, tile = 64, 300, 128
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    weights, biases = _random_block(
        key, channels, kernel_size, dilations, dtype)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, frames, channels), jnp.float32
    ).astype(dtype)

    expected = resblock.reference_block(
        x, weights, biases, dilations, 0.1, dtype)
    got = resblock._pallas_forward(
        x, weights, biases, dilations, 0.1, interpret=True, tile=tile)

    assert got.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(expected, np.float32),
        rtol=0.05, atol=0.05)


def test_fused_block_gradients_match_reference():
    """custom_vjp backward equals the plain chain's gradients"""
    channels, frames = 8, 40
    dilations, k = (1, 2), 3
    dtype = jnp.float32
    weights, biases = _random_block(
        jax.random.PRNGKey(2), channels, k, dilations, dtype)
    x = jax.random.normal(
        jax.random.PRNGKey(3), (1, frames, channels), dtype)

    def loss_fused(x, w, b):
        return jnp.sum(resblock.fused_block(x, w, b, dilations, 0.1) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(
            resblock.reference_block(x, w, b, dilations, 0.1, dtype) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, weights, biases)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, weights, biases)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_block_module_pallas_flag_parity():
    """Block(pallas=True) matches Block(pallas=False) with shared params"""
    from promonet_tpu.models.hifigan import Block

    channels, frames = 16, 96
    x = jax.random.normal(
        jax.random.PRNGKey(4), (1, frames, channels), jnp.float32)
    plain = Block(channels, 3, (1, 3, 5), 0.1, pallas=False)
    fused = Block(channels, 3, (1, 3, 5), 0.1, pallas=True)

    params = plain.init(jax.random.PRNGKey(5), x)
    # Identical parameter trees: the fused path materializes the same
    # WNConv1d parameters in the same construction order
    params_fused = fused.init(jax.random.PRNGKey(5), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)

    out_plain = plain.apply(params, x)
    out_fused = fused.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_fused), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('channels,batch', [(32, 4), (64, 2), (64, 4)])
def test_lane_packed_kernel_matches_reference(channels, batch):
    """Narrow-width packing (g = 128/C batch elements in lanes) parity.

    The packed kernel must compute g INDEPENDENT C-channel blocks —
    distinct per-batch inputs through block-diagonal weights equal the
    per-element plain chain (ops/resblock.py lane_pack).
    """
    dilations, kernel_size = (1, 3, 5), 3
    frames, tile = 300, 128
    dtype = jnp.bfloat16
    weights, biases = _random_block(
        jax.random.PRNGKey(4), channels, kernel_size, dilations, dtype)
    x = jax.random.normal(
        jax.random.PRNGKey(5), (batch, frames, channels), jnp.float32
    ).astype(dtype)

    # Pin the dots lowering: at batch >= 4 the plain chain picks the
    # XLA-conv lowering whose bf16 rounding differs at the last ulp —
    # the kernel's semantics target is the shifted-dots chain
    from promonet_tpu.models.modules import conv_lowering
    with conv_lowering('shifted'):
        expected = jax.jit(
            lambda x, w, b: resblock.reference_block(
                x, w, b, dilations, 0.1, dtype))(x, weights, biases)
    xp, wp, bp, unpack = resblock.lane_pack(x, weights, biases)
    assert xp.shape == (batch * channels // 128, frames, 128)
    got = unpack(resblock._pallas_forward(
        xp, wp, bp, dilations, 0.1, interpret=True, tile=tile))

    assert got.shape == expected.shape
    # Both sides are bf16 through a six-conv residual chain whose
    # outputs reach |60|; allow a few ulp of the output scale (the
    # packed matmul accumulates 128 lanes in one dot, the plain chain
    # 32 per tap — same fp32 accumulate, different rounding points).
    # Measured vs an fp32 ground truth, packed and plain sit at the
    # SAME distance (max 2.14, mean 0.36) — the tolerance below is
    # tighter than either's distance to truth.
    expected = np.asarray(expected, np.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        expected,
        rtol=0.05, atol=0.02 * np.abs(expected).max())
