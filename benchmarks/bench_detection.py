"""ViT-Det 1024px detection train-step bench (B=2), scan-in-one-jit."""
import time
import functools

import jax, jax.numpy as jnp, numpy as np
from ssl4gie_tpu.core.train_state import make_adamw
from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
from ssl4gie_tpu.tasks.detection import make_detection_train_step, MAX_GT

B, S = 2, 1024
model = FasterRCNN(arch="vit_b", num_classes=2, image_size=S,
                   pos_embed_type="learned", dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
img = jnp.zeros((B, S, S, 3), jnp.float32)
gtb = jnp.tile(jnp.asarray([[100., 100., 300., 300.]]), (B, MAX_GT, 1))
gtl = jnp.ones((B, MAX_GT), jnp.int32)
gtv = jnp.zeros((B, MAX_GT), bool).at[:, 0].set(True)
variables = model.init({"params": rng, "sampler": rng}, img, gtb, gtl, gtv,
                       train=True)
params = variables["params"]
tx = make_adamw(1e-4)
state = (params, tx.init(params))
step = make_detection_train_step(model, tx, 1, variables.get("batch_stats"),
                                 top_level=False)

rng_np = np.random.default_rng(0)
batch = {"image": jnp.asarray(rng_np.random((B, S, S, 3)).astype(np.float32)),
         "gt_boxes": gtb, "gt_labels": gtl, "gt_valid": gtv}

n = 10
from ssl4gie_tpu.core.xla_options import jit_kwargs


@functools.partial(jax.jit, **jit_kwargs("detection"))
def run(state, key):
    def body(st, k):
        st, m = step(st, batch, k)
        return st, m["loss"]
    return jax.lax.scan(body, state, jax.random.split(key, n))

st2, losses = run(state, jax.random.PRNGKey(1))
jax.block_until_ready(losses)
t0 = time.perf_counter()
_, losses = run(state, jax.random.PRNGKey(2))
float(losses[-1])
dt = (time.perf_counter() - t0) / n * 1000
print(f"vitdet 1024 train step: {dt:.1f} ms/step @ B={B}  ({B/dt*1000:.1f} img/s)")
