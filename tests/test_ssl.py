"""SSL pretraining tests: MAE masking semantics + loss parity with the reference
math, MoCo InfoNCE global-batch equivalence, and tiny end-to-end pretrain loops with
encoder->finetune weight transfer."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4gie_tpu.ssl.mae import MAE, patchify, random_masking, unpatchify
from ssl4gie_tpu.ssl.moco_v3 import contrastive_loss


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    x = patchify(imgs, 16)
    assert x.shape == (2, 16, 16 * 16 * 3)
    back = unpatchify(x, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), rtol=1e-6)


def test_patchify_matches_reference_layout():
    """Pixel ordering inside a token must match MAE's nchpwq->nhwpqc einsum."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    p = 16
    t = torch.tensor(img)
    h = w = 32 // p
    x = t.reshape(1, 3, h, p, w, p)
    x = torch.einsum("nchpwq->nhwpqc", x)
    ref = x.reshape(1, h * w, p * p * 3).numpy()

    ours = np.asarray(patchify(jnp.asarray(img.transpose(0, 2, 3, 1)), p))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_random_masking_semantics():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
    xm, mask, ids_restore = random_masking(rng, x, 0.75)
    assert xm.shape == (2, 4, 4)            # keep 25%
    assert mask.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), [12, 12])
    # kept tokens are rows of x, and mask==0 exactly at kept positions
    for b in range(2):
        kept_rows = {tuple(r) for r in np.asarray(xm[b])}
        orig_rows = [tuple(r) for r in np.asarray(x[b])]
        kept_idx = {i for i, r in enumerate(orig_rows) if r in kept_rows}
        unmasked_idx = set(np.where(np.asarray(mask[b]) == 0)[0].tolist())
        assert kept_idx == unmasked_idx


def test_mae_forward_loss_finite_and_masked_only():
    model = MAE(img_size=32, depth=2, decoder_depth=1, norm_pix_loss=True)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init({"params": rng, "mask": rng}, imgs)
    loss, pred, mask = model.apply(variables, imgs, rngs={"mask": rng})
    assert np.isfinite(float(loss))
    assert pred.shape == (2, 4, 16 * 16 * 3)


def test_moco_contrastive_loss_matches_torch_ce():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    k = rng.normal(size=(8, 16)).astype(np.float32)
    T = 0.2
    qn = torch.nn.functional.normalize(torch.tensor(q), dim=1)
    kn = torch.nn.functional.normalize(torch.tensor(k), dim=1)
    logits = torch.einsum("nc,mc->nm", qn, kn) / T
    ref = float(torch.nn.CrossEntropyLoss()(logits, torch.arange(8)) * (2 * T))
    ours = float(contrastive_loss(jnp.asarray(q), jnp.asarray(k), T))
    assert abs(ref - ours) < 1e-5


@pytest.mark.slow
def test_mae_pretrain_loop_and_transfer():
    from ssl4gie_tpu.core.config import (Architecture, DataConfig, PretrainConfig,
                                         RuntimeConfig, SSLFramework)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = PretrainConfig(
            framework=SSLFramework.MAE, architecture=Architecture.VIT_B,
            epochs=1, warmup_epochs=0, batch_size=8, img_size=32,
            model_kwargs=dict(embed_dim=64, depth=2, num_heads=2,
                              decoder_embed_dim=32, decoder_depth=1,
                              decoder_num_heads=2),
            data=DataConfig(synthetic=True, synthetic_size=16, num_workers=2),
            runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
            ckpt_dir=os.path.join(tmp, "pre"))
        from ssl4gie_tpu.ssl.pretrain import run_pretraining
        path = run_pretraining(cfg)
        assert os.path.isdir(path)

        # transfer into a finetune classifier backbone
        from ssl4gie_tpu.convert.loaders import load_orbax_encoder
        from ssl4gie_tpu.models.vit import ViTClassifier
        m = ViTClassifier(num_classes=3, img_size=32, pos_embed_type="sincos")
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        # encoder param names must line up with the finetune backbone; with a tiny
        # MAE the matching subtree is the embed/cls/pos part plus blocks 0-1
        from ssl4gie_tpu.models.vit import ViTBackbone
        tiny = ViTBackbone(img_size=32, embed_dim=64, depth=2, num_heads=2,
                           pos_embed_type="sincos")
        vt = tiny.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        new_params, n = load_orbax_encoder(path, {"backbone": vt["params"]},
                                           "backbone")
        # every encoder tensor matches except pos_embed: MAE computes its fixed
        # sincos pos_embed rather than storing it, and the finetune backbone's
        # sincos init reproduces the identical values (models/layers.py)
        n_expected = len(jax.tree_util.tree_leaves(vt["params"])) - 1
        assert n == n_expected


@pytest.mark.slow
def test_moco_pretrain_loop():
    from ssl4gie_tpu.core.config import (Architecture, DataConfig, PretrainConfig,
                                         RuntimeConfig, SSLFramework)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = PretrainConfig(
            framework=SSLFramework.MOCOV3, architecture=Architecture.RESNET50,
            epochs=1, warmup_epochs=0, batch_size=8, img_size=32,
            moco_dim=32, moco_mlp_dim=64,
            data=DataConfig(synthetic=True, synthetic_size=16, num_workers=2),
            runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
            ckpt_dir=os.path.join(tmp, "pre"))
        from ssl4gie_tpu.ssl.pretrain import run_pretraining
        path = run_pretraining(cfg)
        assert os.path.isdir(path)


def _tiny_mae_cfg(tmp, epochs=3, scan_steps=1):
    from ssl4gie_tpu.core.config import (Architecture, DataConfig,
                                         PretrainConfig, RuntimeConfig,
                                         SSLFramework)
    # scan_steps=1 keeps the Throughput meter (and so the preempt-kill hooks
    # below) at per-STEP granularity; production chunks scan_steps per dispatch
    return PretrainConfig(
        framework=SSLFramework.MAE, architecture=Architecture.VIT_B,
        epochs=epochs, warmup_epochs=0, batch_size=8, img_size=32,
        model_kwargs=dict(embed_dim=64, depth=2, num_heads=2,
                          decoder_embed_dim=32, decoder_depth=1,
                          decoder_num_heads=2),
        data=DataConfig(synthetic=True, synthetic_size=16, num_workers=2),
        runtime=RuntimeConfig(compute_dtype="float32", log_every=1,
                              scan_steps=scan_steps),
        ckpt_dir=os.path.join(tmp, "pre"))


@pytest.mark.slow
def test_pretrain_scan_steps_invariance():
    """The scan_steps-chunked dispatch must be a pure performance knob: the
    same batches + per-step keys replay, so final params match the per-step
    (scan_steps=1) path."""
    import ssl4gie_tpu.ssl.pretrain as pre
    from ssl4gie_tpu.core import checkpoint as ckpt_lib

    def run(tmp, k):
        path = pre.run_pretraining(_tiny_mae_cfg(tmp, scan_steps=k))
        mgr = ckpt_lib.CheckpointManager(os.path.dirname(path),
                                         os.path.basename(path))
        return mgr.restore()["params"]

    with tempfile.TemporaryDirectory() as ta, \
            tempfile.TemporaryDirectory() as tb:
        pa = jax.tree_util.tree_leaves(run(ta, 1))
        pb = jax.tree_util.tree_leaves(run(tb, 2))
        assert len(pa) == len(pb)
        for a, b in zip(pa, pb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-6)


@pytest.mark.slow
def test_pretrain_preempt_resume_exact_replay(monkeypatch):
    """The full pretraining resume protocol (`main_moco.py:310-316`,
    `mae/util/misc.py:315-329` equivalents): SIGTERM a synthetic MAE pretrain
    mid-epoch-2, relaunch the same command, and assert (a) it resumes at epoch
    2 (not epoch 1) and (b) the final params are bit-identical to an
    uninterrupted run (per-epoch RNG + (seed, epoch) loader shuffle make the
    interrupted epoch replay exactly)."""
    import signal

    from ssl4gie_tpu.core import checkpoint as ckpt_lib
    from ssl4gie_tpu.core.preempt import Preempted
    import ssl4gie_tpu.ssl.pretrain as pre

    def export_tree(path):
        mgr = ckpt_lib.CheckpointManager(os.path.dirname(path),
                                         os.path.basename(path))
        return mgr.restore()

    with tempfile.TemporaryDirectory() as tmp_a, \
            tempfile.TemporaryDirectory() as tmp_b:
        # run A: uninterrupted 3 epochs
        path_a = pre.run_pretraining(_tiny_mae_cfg(tmp_a))
        ref = export_tree(path_a)
        assert int(ref["meta"]["epoch"]) == 3

        # run B: SIGTERM during epoch 2 step 1 (2 steps/epoch), then relaunch
        calls = {"n": 0}
        real_throughput = pre.Throughput

        class KillingThroughput(real_throughput):
            def update(self, n, steps=1):
                calls["n"] += 1
                if calls["n"] == 3:
                    os.kill(os.getpid(), signal.SIGTERM)
                    signal.getsignal(signal.SIGTERM)   # force handler delivery
                return super().update(n, steps=steps)

        monkeypatch.setattr(pre, "Throughput", KillingThroughput)
        cfg_b = _tiny_mae_cfg(tmp_b)
        with pytest.raises(Preempted):
            pre.run_pretraining(cfg_b)

        resume = ckpt_lib.CheckpointManager(
            cfg_b.ckpt_dir, "mae_vit_b.resume").restore()
        assert int(resume["meta"]["epoch"]) == 1   # only epoch 1 complete

        # relaunch: must resume at epoch 2 and finish identically to run A
        logged = []
        real_log = pre.MetricsLogger.log
        monkeypatch.setattr(pre.MetricsLogger, "log",
                            lambda self, rec, echo=None:
                            (logged.append(rec), real_log(self, rec, echo))[1])
        path_b = pre.run_pretraining(cfg_b)
        assert any(r.get("resumed_from_epoch") == 1 for r in logged)
        out = export_tree(path_b)
        assert int(out["meta"]["epoch"]) == 3
        ra = jax.tree_util.tree_leaves(ref["params"])
        rb = jax.tree_util.tree_leaves(out["params"])
        assert len(ra) == len(rb)
        for a, b in zip(ra, rb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_moco_pretrain_resume_state_complete(monkeypatch):
    """The MoCo .resume slot must carry predictor + momentum params/stats +
    opt_state + step (everything the round-2 export dropped), and a relaunch
    must pick up at epoch+1 with the restored step counter."""
    from ssl4gie_tpu.core import checkpoint as ckpt_lib
    import ssl4gie_tpu.ssl.pretrain as pre
    from ssl4gie_tpu.core.config import (Architecture, DataConfig,
                                         PretrainConfig, RuntimeConfig,
                                         SSLFramework)

    with tempfile.TemporaryDirectory() as tmp:
        cfg = PretrainConfig(
            framework=SSLFramework.MOCOV3, architecture=Architecture.RESNET50,
            epochs=1, warmup_epochs=0, batch_size=8, img_size=32,
            moco_dim=32, moco_mlp_dim=64,
            data=DataConfig(synthetic=True, synthetic_size=16, num_workers=2),
            runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
            ckpt_dir=os.path.join(tmp, "pre"))
        pre.run_pretraining(cfg)

        resume = ckpt_lib.CheckpointManager(
            cfg.ckpt_dir, "mocov3_resnet50.resume").restore()
        st = resume["state"]
        assert int(resume["meta"]["epoch"]) == 1
        assert int(st["step"]) == 2                      # 16/8 = 2 steps
        for k in ("params", "momentum_params", "batch_stats",
                  "momentum_batch_stats", "opt_state"):
            assert k in st, k
        assert "predictor" in st["params"]
        assert jax.tree_util.tree_leaves(st["momentum_params"])

        # relaunch with more epochs: resumes at 2, step counter continues
        import dataclasses
        cfg2 = dataclasses.replace(cfg, epochs=2)
        logged = []
        real_log = pre.MetricsLogger.log
        monkeypatch.setattr(pre.MetricsLogger, "log",
                            lambda self, rec, echo=None:
                            (logged.append(rec), real_log(self, rec, echo))[1])
        pre.run_pretraining(cfg2)
        assert any(r.get("resumed_from_epoch") == 1 for r in logged)
        resume2 = ckpt_lib.CheckpointManager(
            cfg.ckpt_dir, "mocov3_resnet50.resume").restore()
        assert int(resume2["meta"]["epoch"]) == 2
        assert int(resume2["state"]["step"]) == 4


def test_random_resized_crop_matmul_bilinear_exact():
    """The separable interp-matmul crop equals direct bilinear sampling at the
    same source coordinates (numpy reference)."""
    import jax
    import jax.numpy as jnp

    from ssl4gie_tpu.data.ssl_augment import random_resized_crop

    rng = np.random.default_rng(0)
    B, H, out = 3, 32, 16
    img = jnp.asarray(rng.random((B, H, H, 3)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    got = np.asarray(random_resized_crop(key, img, out))

    # recompute the crop params exactly as the function does
    ka, kr, kx, ky = jax.random.split(key, 4)
    area = np.asarray(jax.random.uniform(ka, (B,), minval=0.2, maxval=1.0)) * H * H
    r = np.exp(np.asarray(jax.random.uniform(
        kr, (B,), minval=np.log(3 / 4), maxval=np.log(4 / 3))))
    w = np.clip(np.sqrt(area * r), 1.0, H)
    h = np.clip(np.sqrt(area / r), 1.0, H)
    x0 = np.asarray(jax.random.uniform(kx, (B,))) * (H - w)
    y0 = np.asarray(jax.random.uniform(ky, (B,))) * (H - h)

    im = np.asarray(img)
    ref = np.zeros_like(got)
    for b in range(B):
        for yo in range(out):
            for xo in range(out):
                sxc = min(max(x0[b] + xo * w[b] / out, 0), H - 1)
                syc = min(max(y0[b] + yo * h[b] / out, 0), H - 1)
                xi, yi = int(sxc), int(syc)
                fx, fy = sxc - xi, syc - yi
                xi1, yi1 = min(xi + 1, H - 1), min(yi + 1, H - 1)
                top = im[b, yi, xi] * (1 - fx) + im[b, yi, xi1] * fx
                bot = im[b, yi1, xi] * (1 - fx) + im[b, yi1, xi1] * fx
                ref[b, yo, xo] = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mae_size_presets_param_counts():
    """MAE_SIZES must reproduce the reference factories
    (`Models/mae/models_mae.py:223-250`). Golden totals = the published torch
    parameter counts (111.91M / 329.54M / 657.07M) minus the sin-cos pos
    embeds, which torch stores as (frozen) nn.Parameters while we keep them as
    compile-time constants: e.g. vit_b 111,655,680 + 197*768 + 197*512 =
    111,907,840. Counted via eval_shape (no allocation)."""
    import functools

    from ssl4gie_tpu.ssl.mae import MAE_SIZES

    golden = {"vit_b": 111_655_680, "vit_l": 329_239_296,
              "vit_h": 656_613_964}
    for name, kw in MAE_SIZES.items():
        model = MAE(**kw)
        sample = jax.ShapeDtypeStruct((2, 224, 224, 3), jnp.float32)
        var = jax.eval_shape(
            functools.partial(model.init, train=True),
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(0)},
            sample)
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(var["params"]))
        assert n == golden[name], (name, n)


def test_mae_architecture_preset_dispatch():
    """run_pretraining maps --architecture to the size preset; model_kwargs
    overrides still win (this is how the tiny e2e tests shrink the model)."""
    from ssl4gie_tpu.ssl.mae import MAE_SIZES

    assert set(MAE_SIZES) == {"vit_b", "vit_l", "vit_h"}
    assert MAE_SIZES["vit_l"] == dict(patch_size=16, embed_dim=1024,
                                      depth=24, num_heads=16)
    assert MAE_SIZES["vit_h"] == dict(patch_size=14, embed_dim=1280,
                                      depth=32, num_heads=16)
    size = dict(MAE_SIZES["vit_l"])
    size.update({"depth": 2})
    assert size["depth"] == 2 and size["embed_dim"] == 1024


def test_mae_remat_is_numerically_identical():
    """remat=True recomputes block activations in the backward — same math,
    same param tree (checkpoints transfer 1:1), identical loss and grads."""
    kw = dict(img_size=32, embed_dim=64, depth=2, num_heads=2,
              decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    init_rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}

    def loss_and_grads(remat):
        m = MAE(**kw, remat=remat)
        params = m.init(init_rngs, imgs, train=True)["params"]

        def loss_fn(p):
            loss, _, _ = m.apply({"params": p}, imgs, train=True,
                                 rngs={"mask": jax.random.PRNGKey(2)})
            return loss
        return params, jax.jit(jax.value_and_grad(loss_fn))(params)

    p0, (l0, g0) = loss_and_grads(False)
    p1, (l1, g1) = loss_and_grads(True)
    # identical param tree structure AND values (same init names/order)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pretrain_retained_checkpoints_mae():
    """The retained-history protocol (`Models/mae/main_pretrain.py:197-204`):
    a 3-epoch run with the MAE rule (epoch0 % every == 0 or last) keeps
    checkpoint-0 and checkpoint-2 but not checkpoint-1, alongside the export
    and .resume slots; each numbered slot restores with its epoch meta."""
    import dataclasses

    import ssl4gie_tpu.ssl.pretrain as pre
    from ssl4gie_tpu.core import checkpoint as ckpt_lib

    with tempfile.TemporaryDirectory() as tmp:
        cfg = dataclasses.replace(_tiny_mae_cfg(tmp, epochs=3), save_every=2)
        pre.run_pretraining(cfg)
        names = sorted(os.listdir(cfg.ckpt_dir))
        assert "checkpoint-0" in names          # epoch0 0 % 2 == 0
        assert "checkpoint-1" not in names
        assert "checkpoint-2" in names          # last epoch always retained
        restored = ckpt_lib.CheckpointManager(cfg.ckpt_dir,
                                              "checkpoint-2").restore()
        assert int(restored["meta"]["epoch"]) == 3
        assert "params" in restored["state"] and "opt_state" in restored["state"]


def test_retained_save_moco_naming_and_retention():
    """MoCo naming contract `checkpoint_%04d` (0-based epoch,
    `main_moco.py:310-316`) + the beyond-reference keep_last pruning."""
    from ssl4gie_tpu.core.config import PretrainConfig, SSLFramework
    from ssl4gie_tpu.ssl.pretrain import _retained_save

    with tempfile.TemporaryDirectory() as tmp:
        cfg = PretrainConfig(framework=SSLFramework.MOCOV3, epochs=3,
                             keep_last=2, ckpt_dir=tmp)
        state = {"w": np.ones((2, 2), np.float32)}
        for epoch in (1, 2, 3):                 # default MoCo every=1
            _retained_save(cfg, state, epoch)
        names = sorted(d for d in os.listdir(tmp) if d.startswith("checkpoint"))
        assert names == ["checkpoint_0001", "checkpoint_0002"]


def test_pretrain_cli_threads_retention_flags(monkeypatch):
    """--save-every/--keep-last reach PretrainConfig through the CLI."""
    import sys

    from ssl4gie_tpu.cli import pretrain as cli

    seen = {}
    monkeypatch.setattr("ssl4gie_tpu.ssl.pretrain.run_pretraining",
                        lambda cfg: seen.setdefault("cfg", cfg) and "" or "")
    monkeypatch.setattr(sys, "argv", [
        "pretrain", "--framework", "mae", "--architecture", "vit_b",
        "--synthetic", "--epochs", "2", "--batch-size", "8",
        "--save-every", "5", "--keep-last", "3"])
    cli.main()
    cfg = seen["cfg"]
    assert cfg.save_every == 5 and cfg.keep_last == 3
