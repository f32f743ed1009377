"""Depth finetune throughput (ViT-B + DPT depth head, SSI loss, flips-only
joint aug — `train_depth.py` recipe) at the reference batch size 48.

    PYTHONPATH=/root/repo python benchmarks/bench_depth.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.core.config import Architecture, Pretraining, Task
from ssl4gie_tpu.core.train_state import TrainState, make_adamw
from ssl4gie_tpu.core.trainer import TaskDefinition, make_train_step
from ssl4gie_tpu.core.xla_options import jit_kwargs
from ssl4gie_tpu.data.augment import augment_train_batch
from ssl4gie_tpu.metrics.depth import ssi_loss
from ssl4gie_tpu.tasks.build import build_model

B = 48
model = build_model(Task.DEPTH, Architecture.VIT_B, num_classes=1,
                    pretraining=Pretraining.RANDOM, framework=None,
                    out_token="cls", img_size=224, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x0 = jnp.zeros((B, 224, 224, 3), jnp.float32)
variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
    {"params": rng, "dropout": rng}, x0)
tx = make_adamw(1e-4)
state = TrainState.create(model.apply, variables["params"], tx,
                          variables.get("batch_stats", {}))
td = TaskDefinition(name="depth", aug_mode="depth", target_key="depth",
                    loss_fn=lambda pred, tgt: ssi_loss(pred, tgt, alpha=0.1),
                    eval_metric_fn=None, eval_kind="batch_metric",
                    select_mode="min")  # depth DPT head has no dropout
train_step = make_train_step(td, accum_steps=1, top_level=False)
rng_np = np.random.default_rng(0)
img_u8 = jax.device_put(rng_np.integers(0, 256, (B, 224, 224, 3),
                                        dtype=np.uint8))
depth = jax.device_put(rng_np.random((B, 224, 224, 1)).astype(np.float32))

n = 10


@functools.partial(jax.jit, **jit_kwargs("depth"))
def run(state, img_u8, depth, key):
    def body(st, k):
        ka, ks = jax.random.split(k)
        img, d2 = augment_train_batch(ka, img_u8, depth, mode="depth")
        st, mtr = train_step(st, {"image": img, "depth": d2}, ks)
        return st, mtr["loss"]
    return jax.lax.scan(body, state, jax.random.split(key, n))


st2, losses = run(state, img_u8, depth, jax.random.PRNGKey(1))
jax.block_until_ready(losses)
t0 = time.perf_counter()
_, losses = run(state, img_u8, depth, jax.random.PRNGKey(2))
float(losses[-1])
dt = (time.perf_counter() - t0) / n * 1000
print(f"depth full aug+train: {dt:.1f} ms/step  {B / dt * 1000:.1f} img/s")
