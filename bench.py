"""Benchmark: ViT-B/16 224px classification finetune throughput (images/sec/chip).

Runs the full jitted SPMD train step (bf16 compute, fp32 params/AdamW, on-device
fused augmentation included) on the available TPU chip(s) and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}.

Baseline: the build target of 4,000 images/sec/chip for ViT-B 224px finetune on
TPU v5e (BASELINE.md north star).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 4000.0


def main(with_loader: bool = False):
    from ssl4gie_tpu.core.mesh import data_sharding, make_mesh, replicated
    from ssl4gie_tpu.core.train_state import TrainState, make_adamw
    from ssl4gie_tpu.core.trainer import TaskDefinition, make_train_step
    from ssl4gie_tpu.data.augment import augment_train_batch
    from ssl4gie_tpu.metrics.classification import weighted_cross_entropy
    from ssl4gie_tpu.models.vit import ViTClassifier

    n_chips = jax.device_count()
    mesh = make_mesh()
    # B=192/chip measured fastest post round-4 kernel ports (bench_batch_sweep:
    # 1124.5 @ 128, 1118.3 @ 160, 1134.3 @ 192, 1111.3 @ 224 img/s/chip;
    # confirmed 1133.4 by the independent bench_xla_options --batch 192 run)
    batch_per_chip = 192
    B = batch_per_chip * n_chips

    model = ViTClassifier(num_classes=6, img_size=224, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x0)

    tx = make_adamw(1e-4)
    state = TrainState.create(model.apply, variables["params"], tx, {})
    state = jax.device_put(state, replicated(mesh))

    td = TaskDefinition(name="classification", aug_mode="classification",
                        target_key="label",
                        loss_fn=lambda lg, lb: weighted_cross_entropy(lg, lb),
                        eval_metric_fn=None, eval_kind="accumulate_preds")
    train_step = make_train_step(td, accum_steps=1, top_level=False)

    rng_np = np.random.default_rng(0)
    img_u8 = jax.device_put(
        rng_np.integers(0, 256, size=(B, 224, 224, 3), dtype=np.uint8),
        data_sharding(mesh, 4))
    labels = jax.device_put(rng_np.integers(0, 6, size=(B,)).astype(np.int32),
                            data_sharding(mesh, 1))

    def full_step(state, img_u8, labels, key):
        kaug, kstep = jax.random.split(key)
        img, _ = augment_train_batch(kaug, img_u8, mode="classification")
        return train_step(state, {"image": img, "label": labels}, kstep)

    if with_loader:
        # honest e2e mode (--with-loader): threaded SyntheticSource decode +
        # double-buffered prefetch_to_device IN the timed loop, one python
        # dispatch per step — the real production path. On this 1-core host +
        # relay it under-reads (host decode can't overlap, ~40 ms dispatch per
        # call); on a TPU VM the two numbers converge.
        from ssl4gie_tpu.data.loader import (Loader, SyntheticSource,
                                             prefetch_to_device)
        from ssl4gie_tpu.core.xla_options import jit_kwargs
        step_fn = jax.jit(full_step, donate_argnums=(0,),
                          **jit_kwargs("classification"))
        n_steps = 20
        src = SyntheticSource(B * (n_steps + 2), size=224)
        loader = Loader(src, B, shuffle=False, drop_last=True, seed=0,
                        num_threads=8)

        def run_epoch(state, epoch):
            key = jax.random.PRNGKey(epoch)
            keys = jax.random.split(key, n_steps + 2)
            losses = None
            for i, batch in enumerate(prefetch_to_device(
                    loader.epoch(epoch), mesh)):
                state, m = step_fn(state, batch["image"], batch["label"],
                                   keys[i])
                losses = m["loss"]
            return state, losses

        state, losses = run_epoch(state, 0)            # warmup / compile
        float(losses)
        t0 = time.perf_counter()
        state, losses = run_epoch(state, 1)
        float(losses)
        dt = time.perf_counter() - t0
        per_chip = B * (n_steps + 2) / dt / n_chips
        print(json.dumps({
            "metric": "vit_b_224_finetune_e2e_loader_images_per_sec_per_chip",
            "value": round(per_chip, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        }))
        return

    # n_steps are scanned inside ONE jit: the axon relay adds ~40 ms of
    # non-pipelined dispatch latency per python-level call (verified against the
    # profiler: device steps run back-to-back with 0 ms gaps), which on a real
    # TPU VM host is microseconds. The scan measures hardware throughput.
    from ssl4gie_tpu.core.xla_options import jit_kwargs
    @functools.partial(jax.jit, **jit_kwargs("classification"))
    def run(state, img_u8, labels, key):
        def body(st, k):
            st, m = full_step(st, img_u8, labels, k)
            return st, m["loss"]
        return jax.lax.scan(body, state, jax.random.split(key, n_steps))

    n_steps = 20
    key = jax.random.PRNGKey(1)
    state2, losses = run(state, img_u8, labels, key)   # warmup / compile
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    _, losses = run(state, img_u8, labels, key)
    # fetch a value (not just block_until_ready): through the remote-execution
    # relay only a host value fetch reliably waits for the dependency chain.
    float(losses[-1])
    dt = time.perf_counter() - t0

    imgs_per_sec = B * n_steps / dt
    per_chip = imgs_per_sec / n_chips
    result = {
        "metric": "vit_b_224_finetune_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    }
    # Secondary detection metric (round-5 VERDICT item 3) — guarded so a
    # detection hiccup can never cost the headline: on timeout/error the line
    # is printed without the extra key.
    import signal

    class _DetTimeout(Exception):
        pass

    def _fire(signum, frame):
        raise _DetTimeout

    old = signal.signal(signal.SIGALRM, _fire)
    signal.alarm(1200)
    try:
        # Free the headline program's HBM buffers, then run the detection leg
        # in a FRESH process: ViT-Det B=4 needs nearly the whole chip, and
        # with the classification state resident it ResourceExhausts; even
        # after in-process dels the relay context stays memory-pressured
        # (measured 0.43 img/s vs 12.6 standalone — spill thrashing). A clean
        # process reproduces the standalone number.
        import gc
        import os
        import subprocess
        del state, state2, losses, img_u8, labels, variables, x0
        jax.clear_caches()
        gc.collect()
        proc = subprocess.run(
            [sys.executable, "-c",
             "import bench; print('DET', bench._detection_throughput())"],
            capture_output=True, text=True, timeout=1150,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in proc.stdout.splitlines() if l.startswith("DET ")][-1]
        result["detection_vitdet_1024_images_per_sec_per_chip"] = round(
            float(line.split()[1]) / n_chips, 2)
    except BaseException:
        pass
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    print(json.dumps(result))


def _detection_throughput(B: int = 4, n: int = 5) -> float:
    """ViT-Det 1024px train-step throughput (img/s), scan-in-one-jit, batch
    passed as a jit argument (NOT a scan closure constant — see CLAUDE.md).
    B=4 is the measured single-chip HBM ceiling for the unremat'd 1024px
    step (B>=6 ResourceExhausted, round-5 sweep) and also its throughput
    optimum (12.6 img/s vs 11.5 at B=2)."""
    from ssl4gie_tpu.core.train_state import make_adamw
    from ssl4gie_tpu.core.xla_options import jit_kwargs
    from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
    from ssl4gie_tpu.tasks.detection import MAX_GT, make_detection_train_step

    S = 1024
    model = FasterRCNN(arch="vit_b", num_classes=2, image_size=S,
                       pos_embed_type="learned", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    gtb = jnp.tile(jnp.asarray([[100., 100., 300., 300.]]), (B, MAX_GT, 1))
    gtl = jnp.ones((B, MAX_GT), jnp.int32)
    gtv = jnp.zeros((B, MAX_GT), bool).at[:, 0].set(True)
    variables = model.init({"params": rng, "sampler": rng},
                           jnp.zeros((B, S, S, 3), jnp.float32), gtb, gtl, gtv,
                           train=True)
    tx = make_adamw(1e-4)
    state = (variables["params"], tx.init(variables["params"]))
    step = make_detection_train_step(model, tx, 1,
                                     variables.get("batch_stats"),
                                     top_level=False)
    batch = {"image": jnp.asarray(
                 np.random.default_rng(0).random((B, S, S, 3), np.float32)),
             "gt_boxes": gtb, "gt_labels": gtl, "gt_valid": gtv}

    @functools.partial(jax.jit, **jit_kwargs("detection"))
    def run(state, batch, key):
        def body(st, k):
            st, m = step(st, batch, k)
            return st, m["loss"]
        return jax.lax.scan(body, state, jax.random.split(key, n))

    _, losses = run(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    _, losses = run(state, batch, jax.random.PRNGKey(2))
    float(losses[-1])
    return B * n / (time.perf_counter() - t0)


def _watchdog(seconds: int = 1200):
    """If the TPU relay is unreachable, jax backend init hangs forever; emit
    one honest JSON line instead of wedging the driver. SIGALRM only — no
    effect on a healthy run (the alarm is cancelled on completion)."""
    import signal

    def fire(signum, frame):
        print(json.dumps({
            "metric": "vit_b_224_finetune_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"bench did not complete within {seconds}s "
                     "(TPU relay unreachable?)",
        }), flush=True)
        raise SystemExit(3)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


if __name__ == "__main__":
    _watchdog()
    main(with_loader="--with-loader" in sys.argv)
