"""Pallas attention dispatch under a multi-device data mesh.

Mosaic custom calls cannot be auto-partitioned by GSPMD (XLA raises
"Mosaic kernels cannot be automatically partitioned. Please wrap the call in
a shard_map", jax tpu_custom_call.py:344-352) — single-chip benches and the
CPU dryrun (Pallas branches gated off) never exercise this, so the multi-chip
train step would fail to compile on real pods without the
`shard_pallas_over_batch` wrapper in models/layers.py.

These tests force the TPU dispatch branches on the 8-device CPU mesh with the
Mosaic kernels monkeypatched to math-equivalent plain-jax functions (interpret
mode deadlocks under multi-device shard_map: its host callbacks have no
cross-shard rendezvous). That validates the full dispatch path — branch
selection, shard_map wrapping over the sharded batch, forward AND gradients,
and the indivisible-batch fallback. The kernel math itself is covered by the
existing interpret-mode parity tests; Mosaic-inside-shard_map is the
jax-documented composition and runs only on real TPUs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4gie_tpu.core.mesh import data_sharding, make_mesh
from ssl4gie_tpu.models import layers


def _fake_fused_qkv_attention(qkv, num_heads, scale):
    """Math-equivalent stand-in for kernels.dense_attention.fused_qkv_attention
    (packed [q|k|v] columns, per-head attention)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)
    o = layers.plain_attention(heads(q), heads(k), heads(v), scale)
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)


def _fake_windowed_attention(qkv, num_heads, window, scale):
    B, GH, GW, C3 = qkv.shape
    C = C3 // 3
    nh, nw = GH // window, GW // window
    x = qkv.reshape(B, nh, window, nw, window, C3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * nh * nw,
                                              window * window, C3)
    o = _fake_fused_qkv_attention(x, num_heads, scale)
    o = o.reshape(B, nh, nw, window, window, C)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(B, GH, GW, C)


def _run_attention(model, params, x, sharded_mesh=None, **apply_kw):
    def f(p, xx):
        return model.apply({"params": p}, xx, **apply_kw)

    def loss(p, xx):
        return jnp.sum(f(p, xx).astype(jnp.float32) ** 2)

    if sharded_mesh is not None:
        x = jax.device_put(x, data_sharding(sharded_mesh, x.ndim))
    out = jax.jit(f)(params, x)
    g = jax.jit(jax.grad(loss, argnums=1))(params, x)
    return np.asarray(out), np.asarray(g)


def test_dense_dispatch_shard_map_multi_device(monkeypatch):
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    import ssl4gie_tpu.kernels.dense_attention as da
    model = layers.Attention(dim=64, num_heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 197, 64)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    ref_out, ref_g = _run_attention(model, params, x)   # backend=cpu -> plain

    calls = []
    def spy(qkv, num_heads, scale):
        calls.append(qkv.shape)
        return _fake_fused_qkv_attention(qkv, num_heads, scale)

    monkeypatch.setattr(da, "fused_qkv_attention", spy)
    monkeypatch.setattr(layers, "pallas_backend", lambda: "tpu")
    mesh = make_mesh((n,), ("data",))
    out, g = _run_attention(model, params, x, sharded_mesh=mesh)

    # the kernel ran on the LOCAL batch shard (B/n per device), proving the
    # shard_map actually partitioned the call
    assert calls and calls[0][0] == 8 // n, calls
    np.testing.assert_allclose(out, ref_out, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g, ref_g, rtol=2e-4, atol=2e-4)


def test_window_dispatch_shard_map_multi_device(monkeypatch):
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    import ssl4gie_tpu.kernels.window_attention as wa
    model = layers.Attention(dim=64, num_heads=2, window_size=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (8, 64, 64)).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), x, grid_hw=(8, 8))["params"]
    ref_out, ref_g = _run_attention(model, params, x, grid_hw=(8, 8))

    calls = []
    def spy(qkv, num_heads, window, scale):
        calls.append(qkv.shape)
        return _fake_windowed_attention(qkv, num_heads, window, scale)

    monkeypatch.setattr(wa, "windowed_flash_attention", spy)
    monkeypatch.setattr(layers, "pallas_backend", lambda: "tpu")
    mesh = make_mesh((n,), ("data",))
    out, g = _run_attention(model, params, x, sharded_mesh=mesh,
                            grid_hw=(8, 8))

    assert calls and calls[0][0] == 8 // n, calls
    np.testing.assert_allclose(out, ref_out, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g, ref_g, rtol=2e-4, atol=2e-4)


def test_indivisible_batch_falls_back_to_xla(monkeypatch):
    """B=6 on 8 devices: shard_pallas_over_batch returns None and the module
    must fall through to the plain XLA path instead of crashing."""
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    model = layers.Attention(dim=64, num_heads=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (6, 197, 64)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref_out, _ = _run_attention(model, params, x)

    monkeypatch.setattr(layers, "pallas_backend", lambda: "tpu")
    out, _ = _run_attention(model, params, x)
    np.testing.assert_allclose(out, ref_out, rtol=1e-6, atol=1e-6)


def test_single_device_unwrapped():
    from ssl4gie_tpu.models.layers import shard_pallas_over_batch
    fn = lambda x: x
    assert shard_pallas_over_batch(fn, 4, (3,), 3) is fn \
        or len(jax.devices()) > 1
    # multi-device + divisible -> wrapped callable; indivisible -> None
    if len(jax.devices()) > 1:
        assert shard_pallas_over_batch(fn, 3, (3,), 3) is None
        assert callable(
            shard_pallas_over_batch(fn, len(jax.devices()), (3,), 3))


def test_rotation_dispatch_shard_map_multi_device(monkeypatch):
    """rotate_nearest_shear's Pallas branch must also go through shard_map;
    stand-in returns its input so we just assert the wrapper ran per-shard and
    the output reassembles to global batch shape."""
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    import ssl4gie_tpu.kernels.rotate as rot
    from ssl4gie_tpu.data import augment

    calls = []
    def spy(g, alpha, beta, P, fill):
        calls.append((g.shape, alpha.shape))
        return g

    monkeypatch.setattr(rot, "shear_rotate_pallas", spy)
    monkeypatch.setattr(layers, "pallas_backend", lambda: "tpu")
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-180, 180, (8,)).astype(np.float32))
    mesh = make_mesh((n,), ("data",))
    img_s = jax.device_put(img, data_sharding(mesh, 4))
    ang_s = jax.device_put(ang, data_sharding(mesh, 1))
    out = jax.jit(augment.rotate_nearest_shear)(img_s, ang_s)
    assert calls and calls[0][0][0] == 8 // n and calls[0][1][0] == 8 // n
    assert out.shape == img.shape


def test_ambient_mesh_preferred(monkeypatch):
    """With a registered 2-D (data, model) training mesh, the wrapper shards
    over ITS data axis (size 4) — not an ad-hoc all-devices mesh — so a batch
    divisible by the data axis but not by the device count keeps the kernel."""
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    from ssl4gie_tpu.models.layers import (set_pallas_mesh,
                                           shard_pallas_over_batch)
    tp_mesh = make_mesh((n // 2, 2), ("data", "model"))
    set_pallas_mesh(tp_mesh)
    try:
        fn = lambda x: x
        # B=4 divides the 4-way data axis but not the 8 devices
        wrapped = shard_pallas_over_batch(fn, n // 2, (2,), 2)
        assert callable(wrapped) and wrapped is not fn
        x = jnp.arange((n // 2) * 3, dtype=jnp.float32).reshape(n // 2, 3)
        np.testing.assert_array_equal(np.asarray(wrapped(x)), np.asarray(x))
        assert shard_pallas_over_batch(fn, 3, (2,), 2) is None
    finally:
        set_pallas_mesh(None)
