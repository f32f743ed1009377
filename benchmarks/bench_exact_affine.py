"""Exact vs fast geometric augmentation: on-TPU step-cost A/B (VERDICT r4 #6).

Measures the fused augmentation program (`augment_train_batch`) with the
default shear/factorized warp vs the exact one-pass gather sampler
(`SSL4GIE_EXACT_AFFINE` semantics, passed explicitly so one process covers
all four variants), for the two modes that have a geometric warp:

  classification @ B=192 (headline batch): rotation +-180, bf16 on TPU
  segmentation   @ B=48  (seg batch):      joint full affine, fill -1/0

Aug-only is the right A/B unit: the model side of the step is identical, so
the full-step delta equals the aug delta (the aug feeds the model serially
inside the same jit). Timed as a 20-step dependency-chained scan in one jit
(value-fetch barrier; relay dispatch amortized).

Usage: python benchmarks/bench_exact_affine.py
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.data.augment import _augment_train_batch

STEPS = 20


def bench(mode: str, B: int, exact: bool, reps: int = 3):
    rng_np = np.random.default_rng(0)
    img = jax.device_put(
        rng_np.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8))
    target = (jax.device_put((rng_np.random((B, 224, 224, 1)) > 0.5)
                             .astype(np.float32))
              if mode == "segmentation" else None)

    @jax.jit
    def run(key, img, target):
        def body(k, _):
            k, ka = jax.random.split(k)
            if target is None:
                out = _augment_train_batch(ka, img, mode=mode, exact=exact)
                if isinstance(out, tuple):
                    out = out[0]
                v = jnp.sum(out[0, 0, :4].astype(jnp.float32))
            else:
                oi, ot = _augment_train_batch(ka, img, target, mode=mode,
                                              exact=exact)
                v = (jnp.sum(oi[0, 0, :4].astype(jnp.float32))
                     + jnp.sum(ot[0, 0, 0].astype(jnp.float32)))
            return k, v
        _, vs = jax.lax.scan(body, key, None, length=STEPS)
        return vs

    args = (jax.random.PRNGKey(0), img, target)
    float(run(*args)[-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args)[-1])
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{mode:15s} B={B:3d} exact={int(exact)}: {best * 1e3:7.2f} ms/step",
          flush=True)
    return best * 1e3


def main():
    import sys
    modes = [("classification", 192), ("segmentation", 48)]
    if len(sys.argv) > 1:
        modes = [m for m in modes if m[0] == sys.argv[1]]
    res = {}
    for mode, B in modes:
        for exact in (False, True):
            res[(mode, exact)] = bench(mode, B, exact)
    for mode, B in modes:
        f, e = res[(mode, False)], res[(mode, True)]
        print(f"{mode}: fast {f:.2f} -> exact {e:.2f} ms/batch "
              f"(+{e - f:.2f} ms, x{e / f:.2f})")


if __name__ == "__main__":
    main()
