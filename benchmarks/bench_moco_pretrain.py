"""MoCo v3 ViT-B pretrain step bench (two-crop aug + EMA + InfoNCE), B=128."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssl4gie_tpu.data.ssl_augment import moco_two_crops
from ssl4gie_tpu.ssl.lars import lars
from ssl4gie_tpu.ssl.moco_v3 import (MoCoEncoder, MoCoPredictor, MoCoState,
                                     make_moco_train_step)

B = 128
encoder = MoCoEncoder(arch="vit_b", dim=256, mlp_dim=4096, dtype=jnp.bfloat16)
predictor = MoCoPredictor(dim=256, mlp_dim=4096, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
sample = jnp.zeros((2, 224, 224, 3), jnp.float32)
enc_vars = jax.jit(lambda r, x: encoder.init(r, x, train=False))(rng, sample)
pred_vars = jax.jit(lambda r, x: predictor.init(r, x, train=False))(
    rng, jnp.zeros((2, 256), jnp.float32))
params = {"encoder": enc_vars["params"], "predictor": pred_vars["params"]}
stats = {"encoder": enc_vars.get("batch_stats", {}),
         "predictor": pred_vars.get("batch_stats", {})}
tx = lars(1e-3, weight_decay=1e-6)
state = MoCoState(step=jnp.zeros((), jnp.int32), params=params,
                  momentum_params=jax.tree_util.tree_map(
                      jnp.copy, params["encoder"]),
                  batch_stats=stats,
                  momentum_batch_stats=jax.tree_util.tree_map(
                      jnp.copy, stats["encoder"]),
                  opt_state=tx.init(params), tx=tx)
moco_step = make_moco_train_step(encoder, predictor, 1.0)

rng_np = np.random.default_rng(0)
img_u8 = jax.device_put(
    rng_np.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))

n = 10


@jax.jit
def run(state, img_u8, key):
    def body(st, k):
        v1, v2 = moco_two_crops(k, img_u8, out_size=224)
        st, metrics = moco_step(st, v1, v2, jnp.float32(0.99))
        return st, metrics["loss"]
    return jax.lax.scan(body, state, jax.random.split(key, n))


st, losses = run(state, img_u8, jax.random.PRNGKey(1))
jax.block_until_ready(losses)
t0 = time.perf_counter()
_, losses = run(state, img_u8, jax.random.PRNGKey(2))
float(losses[-1])
dt = (time.perf_counter() - t0) / n * 1000
print(f"MoCo v3 pretrain step: {dt:.1f} ms @ B={B}  ({B/dt*1000:.0f} img/s)")
