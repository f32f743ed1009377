"""Per-jit TPU compiler options (scoped-VMEM tuning), per program family.

XLA_FLAGS cannot reach the TPU compiler on relay-attached hosts (the local
process carries only the CPU XLA, which hard-rejects TPU flag names before the
program is shipped), but `jax.jit(compiler_options=...)` IS transmitted and
validated by the remote compiler — so this is the one portable way to tune
TPU compiler knobs, and it works identically on real TPU VMs. jax restricts
compiler_options to the OUTERMOST jit, so step factories take a
`top_level=False` escape hatch for callers that wrap them in their own scan.

Measured on v5e (min of 3 reps, `benchmarks/bench_xla_options.py` + per-task
benches), capping scoped VMEM at 48 MiB vs the default:
- ViT-B 224 classification aug+train: 120.6 -> 116.5 ms/step (+3.5%) — flat
  plateau 32-48 MiB, the MLP fwd+bwd fusions pick deeper tiles without spills
- ViT-Det 1024 detection train step: 178 -> 175.4 ms (+1.5%)
- Seg ViT-B+DPT 224: 116.2 -> 119.5 ms (-3%) -> NOT applied (32 MiB read
  115.5 once — sub-noise; 24 MiB 118.8)
- MAE pretrain B=256: 195.3 -> 201.5 ms (-3%) -> NOT applied (MoCo: noise;
  128 MiB == default's 195.3, 96 MiB 197.2 — the compiler default is already
  MAE-optimal)

Override / disable globally with SSL4GIE_XLA_OPTIONS:
  SSL4GIE_XLA_OPTIONS=none                          # disable entirely
  SSL4GIE_XLA_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536[,k=v...]  # force all
"""

import os

import jax

_VMEM_48M = {"xla_tpu_scoped_vmem_limit_kib": "49152"}

# programs where the cap measured faster; absent -> compiler default
PER_PROGRAM = {
    "classification": _VMEM_48M,
    "detection": _VMEM_48M,
}


def tpu_compiler_options(program=None):
    """Options dict for (backend, program family), or None (no override)."""
    env = os.environ.get("SSL4GIE_XLA_OPTIONS")
    if env in ("0", "none", "off"):
        return None
    if env:
        return dict(kv.split("=", 1) for kv in env.split(","))
    opts = PER_PROGRAM.get(program)
    if not opts:
        return None
    try:
        platform = jax.default_backend()
    except RuntimeError:
        return None
    # "axon" is the relay backend name for a real TPU chip
    if platform in ("tpu", "axon"):
        return dict(opts)
    return None


def jit_kwargs(program=None):
    """Splat into the OUTERMOST jax.jit(...) of a hot program: {} on CPU/GPU
    or unmeasured programs, the tuned compiler options on TPU."""
    opts = tpu_compiler_options(program)
    return {"compiler_options": opts} if opts else {}
