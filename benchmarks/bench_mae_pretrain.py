import glob, time
import jax, jax.numpy as jnp, numpy as np
import optax
from ssl4gie_tpu.ssl.mae import MAE
from ssl4gie_tpu.data.ssl_augment import mae_augment

B = 256
model = MAE(dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x0 = jnp.zeros((B, 224, 224, 3), jnp.float32)
variables = jax.jit(lambda r, x: model.init(r, x, rng=jax.random.PRNGKey(1)))({"params": rng}, x0)
params = variables["params"]
tx = optax.adamw(1e-4, b1=0.9, b2=0.95)
opt = tx.init(params)
rng_np = np.random.default_rng(0)
img_u8 = jax.device_put(rng_np.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))

def train_step(state, img_u8, key):
    params, opt = state
    ka, km = jax.random.split(key)
    img = mae_augment(ka, img_u8)
    def loss_fn(p):
        loss, _, _ = model.apply({"params": p}, img, rng=km)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt2 = tx.update(grads, opt, params)
    return (optax.apply_updates(params, updates), opt2), loss

n = 10
@jax.jit
def run(state, img_u8, key):
    def body(st, k):
        return train_step(st, img_u8, k)
    return jax.lax.scan(body, state, jax.random.split(key, n))

st, losses = run((params, opt), img_u8, jax.random.PRNGKey(2))
jax.block_until_ready(losses)
t0 = time.perf_counter()
_, losses = run((params, opt), img_u8, jax.random.PRNGKey(3))
float(losses[-1])
print(f"scan wall: {(time.perf_counter()-t0)/n*1000:.1f} ms/step")
