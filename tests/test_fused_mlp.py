"""Fused MLP Pallas kernel parity (interpret mode on CPU) against the plain
XLA formulation: forward and all five gradients, both GELU variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _plain_mlp(x, w1, b1, w2, b2, approximate):
    import flax.linen as nn
    return nn.gelu(x @ w1 + b1, approximate=approximate) @ w2 + b2


@pytest.fixture()
def tensors():
    rng = np.random.default_rng(0)
    M, C, H = 256, 128, 512            # M multiple of the 128-row token tile
    x = rng.normal(0, 1, (2, M // 2, C)).astype(np.float32)
    w1 = (rng.normal(0, 0.05, (C, H))).astype(np.float32)
    b1 = rng.normal(0, 0.02, (H,)).astype(np.float32)
    w2 = (rng.normal(0, 0.05, (H, C))).astype(np.float32)
    b2 = rng.normal(0, 0.02, (C,)).astype(np.float32)
    return tuple(jnp.asarray(t) for t in (x, w1, b1, w2, b2))


@pytest.mark.parametrize("approximate", [True, False])
def test_fused_mlp_forward(tensors, approximate):
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels.fused_mlp import fused_mlp
    x, w1, b1, w2, b2 = tensors
    with pltpu.force_tpu_interpret_mode():
        y = fused_mlp(x, w1, b1, w2, b2, approximate)
    ref = _plain_mlp(x, w1, b1, w2, b2, approximate)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("approximate", [True, False])
def test_fused_mlp_gradients(tensors, approximate):
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels.fused_mlp import fused_mlp
    x, w1, b1, w2, b2 = tensors

    def loss_fused(*args):
        y = fused_mlp(*args, approximate)
        return jnp.sum(y * jnp.cos(y))

    def loss_plain(*args):
        y = _plain_mlp(*args, approximate)
        return jnp.sum(y * jnp.cos(y))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gp, ("dx", "dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_mlp_module_fused_path_parity(monkeypatch):
    """SSL4GIE_FUSED_MLP=1 Mlp path: identical param tree + init values to the
    XLA path, and matching forward output (bf16 tolerance)."""
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.models import layers

    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 128, 64)),
                    jnp.bfloat16)
    mlp = layers.Mlp(hidden_dim=256, out_dim=64, dtype=jnp.bfloat16)

    monkeypatch.setattr(layers, "_FUSED_MLP", False)
    v_plain = mlp.init(jax.random.PRNGKey(0), x)
    y_plain = mlp.apply(v_plain, x)

    monkeypatch.setattr(layers, "_FUSED_MLP", True)
    with pltpu.force_tpu_interpret_mode():
        v_fused = mlp.init(jax.random.PRNGKey(0), x)
        y_fused = mlp.apply(v_fused, x)

    flat_p = jax.tree_util.tree_leaves_with_path(v_plain)
    flat_f = jax.tree_util.tree_leaves_with_path(v_fused)
    assert [p for p, _ in flat_p] == [p for p, _ in flat_f]
    for (_, a), (_, b) in zip(flat_p, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_plain, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_mlp_bf16_close_to_f32():
    """bf16 kernel output tracks the f32 math within bf16 resolution."""
    from jax.experimental.pallas import tpu as pltpu
    from ssl4gie_tpu.kernels.fused_mlp import fused_mlp
    rng = np.random.default_rng(1)
    M, C, H = 128, 128, 256
    x = rng.normal(0, 1, (M, C)).astype(np.float32)
    w1 = rng.normal(0, 0.05, (C, H)).astype(np.float32)
    b1 = np.zeros((H,), np.float32)
    w2 = rng.normal(0, 0.05, (H, C)).astype(np.float32)
    b2 = np.zeros((C,), np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = fused_mlp(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1, jnp.bfloat16),
                      jnp.asarray(b1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16),
                      jnp.asarray(b2, jnp.bfloat16), True)
    ref = _plain_mlp(x, w1, b1, w2, b2, True)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
