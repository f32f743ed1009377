"""Parallelism utilities (re-exported from core.mesh).

Data parallelism here is GSPMD: a 1-D `Mesh(("data",))` with the batch sharded and
the state replicated; XLA inserts gradient psums over ICI and DCN. See
`core/mesh.py` for construction and `docs/PARITY.md` §2.8 for the mapping from the
reference's DDP/NCCL machinery.
"""

from ssl4gie_tpu.core.mesh import (data_sharding, local_batch_size,  # noqa: F401
                                   make_mesh, maybe_init_distributed, replicated,
                                   shard_batch)
