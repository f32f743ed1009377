"""Multi-host (DCN) initialization and helpers.

TPU-native counterpart of the reference's rendezvous detection
(`Models/mae/util/misc.py:216-248`, which probes env://, SLURM and OMPI env
vars before `torch.distributed.init_process_group`): here the collectives are
XLA's, so all that is needed is `jax.distributed.initialize` with the right
coordinator/process identity — afterwards `jax.devices()` spans every host and
a single `Mesh` expresses the whole pod (psum rides ICI within a slice, DCN
across slices; no backend code).

On Cloud TPU pods the runtime autodetects everything and
`jax.distributed.initialize()` needs no arguments; the env-var paths exist for
manual launches and for the 2-process CPU test harness
(`tests/test_distributed.py`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def detect_environment() -> Optional[dict]:
    """Probe the launcher environment, in the reference's order of precedence:
    explicit coordinator env vars, then SLURM, then OpenMPI. Returns kwargs for
    `jax.distributed.initialize`, or None when nothing indicates multi-host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    if "SLURM_NTASKS" in os.environ and int(os.environ["SLURM_NTASKS"]) > 1:
        # jax's builtin SLURM cluster-detection handles the rest
        return {}
    if ("OMPI_COMM_WORLD_SIZE" in os.environ
            and int(os.environ["OMPI_COMM_WORLD_SIZE"]) > 1):
        return {}
    return None


def initialize() -> bool:
    """Initialize multi-host JAX if the environment calls for it.

    Safe to call unconditionally from every CLI entry point (the reference's
    equivalent is calling `init_distributed_mode(args)` at the top of every
    main) — but it must run BEFORE any computation touches the XLA backend.
    Returns True when running multi-process."""
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    kwargs = detect_environment()
    if kwargs is None:
        return False
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def is_primary() -> bool:
    """Host process 0 — gates checkpoint writes, eval, and logging, like the
    reference's rank-0 checks (`train_classification.py:319-327`)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference calls `dist.barrier()` around
    rank-0 I/O every epoch). SPMD programs rarely need this — collectives are
    already synchronizing — but host-side filesystem races do."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
