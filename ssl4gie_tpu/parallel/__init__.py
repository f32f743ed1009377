"""Parallelism: mesh/sharding construction (`core.mesh`) and multi-host
(DCN) initialization (`parallel.distributed`).

Data parallelism here is GSPMD: a 1-D `Mesh(("data",))` with the batch sharded
and the state replicated; XLA inserts gradient psums over ICI and DCN. See
`docs/PARITY.md` §2.8 for the mapping from the reference's DDP/NCCL machinery.
"""

from ssl4gie_tpu.core.mesh import (data_sharding, local_batch_size,  # noqa: F401
                                   make_mesh, replicated, shard_batch)
from ssl4gie_tpu.parallel.distributed import (barrier, detect_environment,  # noqa: F401
                                              initialize, is_primary,
                                              process_count)
