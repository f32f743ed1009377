"""Fused windowed-attention Pallas kernel parity (interpret mode) against the
reshape-based window attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4gie_tpu.models.layers import plain_attention


def reference_windowed(qkv_grid, num_heads, ws, scale):
    B, GH, GW, C3 = qkv_grid.shape
    C = C3 // 3
    Dh = C // num_heads
    nh, nw = GH // ws, GW // ws
    x = qkv_grid.reshape(B, nh, ws, nw, ws, C3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * nh * nw, ws * ws, 3 * C)
    q = x[..., :C].reshape(-1, ws * ws, num_heads, Dh).transpose(0, 2, 1, 3)
    k = x[..., C:2 * C].reshape(-1, ws * ws, num_heads, Dh).transpose(0, 2, 1, 3)
    v = x[..., 2 * C:].reshape(-1, ws * ws, num_heads, Dh).transpose(0, 2, 1, 3)
    o = plain_attention(q, k, v, scale)
    o = o.transpose(0, 2, 1, 3).reshape(B, nh, nw, ws, ws, C)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(B, GH, GW, C)


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3 * 128)).astype(np.float32))


def test_windowed_kernel_forward_parity(qkv):
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels.window_attention import windowed_flash_attention
    scale = (128 // 4) ** -0.5
    with pltpu.force_tpu_interpret_mode():
        out = windowed_flash_attention(qkv, 4, 8, scale)
    ref = reference_windowed(qkv, 4, 8, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_windowed_kernel_gradient_parity(qkv):
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels.window_attention import windowed_flash_attention
    scale = (128 // 4) ** -0.5

    def loss_kernel(qkv):
        o = windowed_flash_attention(qkv, 4, 8, scale)
        return jnp.sum(jnp.sin(o))

    def loss_ref(qkv):
        o = reference_windowed(qkv, 4, 8, scale)
        return jnp.sum(jnp.sin(o))

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=3e-3,
                               atol=3e-3)
