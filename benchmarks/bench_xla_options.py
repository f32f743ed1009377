"""A/B TPU compiler options on the headline train program (bench.py's scanned
ViT-B 224 aug+train step).

XLA_FLAGS cannot carry TPU flags here (the local process only has the CPU XLA,
which rejects unknown flags; compilation happens on the axon relay side), but
jax's per-compile `compiler_options` ARE transmitted and validated remotely —
so this is the one way to sweep TPU compiler knobs on this container.

    python benchmarks/bench_xla_options.py [--batch N]

Prints ms/step + img/s for the baseline and each option set.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

OPTION_SETS = [
    ("baseline", {}),
    ("scoped_vmem_32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_48M", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("scoped_vmem_64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("baseline_again", {}),
]
REPS = 3


def main():
    from ssl4gie_tpu.core.mesh import data_sharding, make_mesh, replicated
    from ssl4gie_tpu.core.train_state import TrainState, make_adamw
    from ssl4gie_tpu.core.trainer import TaskDefinition, make_train_step
    from ssl4gie_tpu.data.augment import augment_train_batch
    from ssl4gie_tpu.metrics.classification import weighted_cross_entropy
    from ssl4gie_tpu.models.vit import ViTClassifier

    n_chips = jax.device_count()
    mesh = make_mesh()
    per_chip = (int(sys.argv[sys.argv.index("--batch") + 1])
                if "--batch" in sys.argv else 128)
    B = per_chip * n_chips
    N_STEPS = 20

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

    lowered = jax.jit(run).lower(state, img_u8, labels, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(1)

    for name, opts in OPTION_SETS:
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:>22}: COMPILE FAILED ({str(e)[:120]})")
            continue
        _, losses = compiled(state, img_u8, labels, key)   # warmup
        jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _, losses = compiled(state, img_u8, labels, key)
            float(losses[-1])                              # value fetch barrier
            best = min(best, time.perf_counter() - t0)
        ms = best / N_STEPS * 1e3
        print(f"{name:>22}: {ms:7.1f} ms/step  "
              f"{B * N_STEPS / best / n_chips:7.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
