"""Batch-size sweep on the headline train program (bench.py's scanned ViT-B 224
aug+train step), plus an optional device-profile dump of the winner.

Round-3 found B=256 SLOWER (872 img/s, memory pressure) and B=128 the standing
default; VERDICT r3 #2 asks for the intermediate points after the round-4
kernel ports (the optimum can move when the attention slice shrinks).

    python benchmarks/bench_batch_sweep.py            # sweep B in {128,160,192,224}
    python benchmarks/bench_batch_sweep.py --profile  # also trace the winner

Prints ms/step + img/s per batch size. Timing by value-fetch barrier (CLAUDE.md:
block_until_ready is unreliable through the relay).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = [128, 160, 192, 224]
REPS = 3
N_STEPS = 20


def build(B):
    from ssl4gie_tpu.core.mesh import data_sharding, make_mesh, replicated
    from ssl4gie_tpu.core.train_state import TrainState, make_adamw
    from ssl4gie_tpu.core.trainer import TaskDefinition, make_train_step
    from ssl4gie_tpu.core.xla_options import tpu_compiler_options
    from ssl4gie_tpu.data.augment import augment_train_batch
    from ssl4gie_tpu.metrics.classification import weighted_cross_entropy
    from ssl4gie_tpu.models.vit import ViTClassifier

    mesh = make_mesh()
    model = ViTClassifier(num_classes=6, img_size=224, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((B, 224, 224, 3), jnp.float32))
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

    def full_step(st, img_u8, labels, key):
        kaug, kstep = jax.random.split(key)
        img, _ = augment_train_batch(kaug, img_u8, mode="classification")
        return train_step(st, {"image": img, "label": labels}, kstep)

    def run(st, img_u8, labels, key):
        def body(s, k):
            s, m = full_step(s, img_u8, labels, k)
            return s, m["loss"]
        return jax.lax.scan(body, st, jax.random.split(key, N_STEPS))

    compiled = jax.jit(run).lower(state, img_u8, labels, jax.random.PRNGKey(1)
                                  ).compile(compiler_options=tpu_compiler_options("classification"))
    return compiled, state, img_u8, labels


def time_one(compiled, state, img_u8, labels):
    key = jax.random.PRNGKey(1)
    _, losses = compiled(state, img_u8, labels, key)  # warmup
    float(losses[-1])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, losses = compiled(state, img_u8, labels, key)
        float(losses[-1])  # value fetch barrier
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    do_profile = "--profile" in sys.argv
    results = []
    for B in BATCHES:
        compiled, state, img_u8, labels = build(B)
        best = time_one(compiled, state, img_u8, labels)
        ms = best / N_STEPS * 1e3
        ips = B * N_STEPS / best
        results.append((B, ms, ips, compiled, state, img_u8, labels))
        print(f"B={B:>4}: {ms:7.1f} ms/step  {ips:7.1f} img/s/chip", flush=True)

    if do_profile:
        B, ms, ips, compiled, state, img_u8, labels = max(results, key=lambda r: r[2])
        print(f"profiling winner B={B} ...", flush=True)
        jax.profiler.start_trace("/tmp/b_sweep_trace")
        _, losses = compiled(state, img_u8, labels, jax.random.PRNGKey(1))
        float(losses[-1])
        jax.profiler.stop_trace()
        print("trace in /tmp/b_sweep_trace", flush=True)


if __name__ == "__main__":
    main()
