"""Flash attention kernel parity (interpret mode on CPU) against the plain XLA
attention: forward and gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4gie_tpu.models.layers import plain_attention


def _plain(q, k, v, scale):
    # (BH, N, D) reference
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v)


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(0)
    BH, N, D = 2, 512, 64
    q = rng.normal(0, 1, (BH, N, D)).astype(np.float32)
    k = rng.normal(0, 1, (BH, N, D)).astype(np.float32)
    v = rng.normal(0, 1, (BH, N, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_forward_matches_plain(qkv, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels import flash_attention as fa
    q, k, v = qkv
    scale = 64 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        o = fa.flash_attention(q, k, v, scale)
    ref = _plain(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_flash_gradients_match_plain(qkv):
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels import flash_attention as fa
    q, k, v = qkv
    scale = 64 ** -0.5

    def loss_flash(q, k, v):
        o = fa.flash_attention(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o))

    def loss_plain(q, k, v):
        o = _plain(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gp, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3,
                                   atol=3e-3, err_msg=name)


def test_flash_padded_gradients_low_lse():
    """Padded-N path (n_valid masking) backward regression: when a query row's
    valid logits are all very negative (lse < -87), the unmasked dq kernel
    computed p=exp(0-lse)=inf for padded key columns and produced NaN dq via
    inf*0 (ADVICE r2). The masked kernel must give finite grads that match
    plain attention on the unpadded arrays."""
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels import flash_attention as fa

    BH, N, D = 2, 197, 64
    rng = np.random.default_rng(3)
    q = rng.normal(0, 1, (BH, N, D)).astype(np.float32)
    k = rng.normal(0, 1, (BH, N, D)).astype(np.float32)
    v = rng.normal(0, 1, (BH, N, D)).astype(np.float32)
    # force one row's scaled valid logits below -100 everywhere -> lse < -87
    q[0, 0] = 40.0
    k[0] = -np.abs(k[0]) - 1.0
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    scale = D ** -0.5

    def loss(fn, q, k, v):
        o = fn(q, k, v)
        return jnp.sum(o * jnp.cos(o))

    def flash_fn(q, k, v):
        return fa.flash_attention_heads(q[:, None], k[:, None], v[:, None],
                                        scale)[:, 0]

    def plain_fn(q, k, v):
        return _plain(q, k, v, scale)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(lambda *a: loss(flash_fn, *a), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda *a: loss(plain_fn, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gp, "qkv"):
        assert np.isfinite(np.asarray(a)).all(), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3,
                                   atol=3e-3, err_msg=name)


def test_fused_qkv_attention_matches_plain():
    """The packed-QKV dense kernel (one VMEM block per image, softmax recomputed
    in the backward) matches head-split plain attention for N=197, including
    the out-of-bounds block rows it must zero in-kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from ssl4gie_tpu.kernels.dense_attention import fused_qkv_attention

    B, H, N, Dh = 2, 4, 197, 64
    C = H * Dh
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * C)).astype(np.float32))
    scale = Dh ** -0.5

    def via_plain(qkv):
        t = qkv.reshape(B, N, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        o = plain_attention(t[0], t[1], t[2], scale)
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)

    ref = via_plain(qkv)
    with pltpu.force_tpu_interpret_mode():
        out = fused_qkv_attention(qkv, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)

    def loss(fn, x):
        o = fn(x)
        return jnp.sum(o * jnp.sin(o))

    g_ref = jax.grad(lambda x: loss(via_plain, x))(qkv)
    with pltpu.force_tpu_interpret_mode():
        g_out = jax.grad(
            lambda x: loss(lambda q: fused_qkv_attention(q, H, scale), x))(qkv)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), rtol=2e-3,
                               atol=2e-3)
