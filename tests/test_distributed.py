"""Multi-host (multi-process) DCN path, exercised for real on CPU.

The reference's multi-node story is `dist.init_process_group` with env-var
rendezvous (`Models/mae/util/misc.py:216-248`); ours is
`jax.distributed.initialize` + a global mesh. This test spawns TWO separate
Python processes that rendezvous over localhost TCP, build a mesh spanning
both hosts' devices, and run a jitted global psum — asserting process_count==2
and the cross-host reduction value. (SPMD "simulated multi-node without a
cluster", SURVEY §4(d) extended to the process dimension.)
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from ssl4gie_tpu.parallel import distributed

    assert distributed.detect_environment() is not None
    assert distributed.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()   # 2 virtual per process

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ssl4gie_tpu.core.mesh import make_mesh

    mesh = make_mesh(axes=("data",))   # all 4 global devices
    pid = jax.process_index()

    # each process contributes its local shard: global batch = [0,1,2,3]
    from jax.experimental import multihost_utils
    local = np.arange(2 * pid, 2 * pid + 2, dtype=np.float32)
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))

    @jax.jit
    def total(x):
        return jnp.sum(x)   # cross-host psum inserted by GSPMD

    out = total(garr)
    # the sum is replicated; every process holds an addressable copy
    val = float(out.addressable_data(0))
    assert val == 6.0, val
    assert distributed.is_primary() == (pid == 0)
    distributed.barrier("test-end")
    print(f"proc {pid}: ok sum={val}")
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(JAX_PLATFORMS="cpu",
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   PYTHONPATH=REPO)
        procs.append(subprocess.Popen([sys.executable, str(script)], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: ok sum=6.0" in out


def test_detect_environment_priorities(monkeypatch):
    from ssl4gie_tpu.parallel import distributed
    for var in ("JAX_COORDINATOR_ADDRESS", "SLURM_NTASKS",
                "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.detect_environment() is None
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert distributed.detect_environment() == {}
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    env = distributed.detect_environment()
    assert env == dict(coordinator_address="10.0.0.1:1234",
                       num_processes=2, process_id=1)


WORKER2 = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from ssl4gie_tpu.parallel import distributed

    assert distributed.initialize()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ssl4gie_tpu.core.checkpoint import host_tree
    from ssl4gie_tpu.core.mesh import data_sharding, make_mesh

    mesh = make_mesh(axes=("data",))
    pid = jax.process_index()

    # production data path (prefetch_to_device semantics): every process
    # provides the SAME global batch; device_put shards it over all hosts
    batch = np.arange(8, dtype=np.float32).reshape(4, 2)
    arr = jax.device_put(batch, data_sharding(mesh, 2))
    assert arr.shape == (4, 2) and not arr.is_fully_addressable

    # jitted step across hosts: batch sharded, weight replicated
    w = jax.device_put(np.ones(2, np.float32), NamedSharding(mesh, P()))
    g = jax.jit(jax.grad(lambda w, x: jnp.sum((x @ w) ** 2)))(w, arr)
    gv = np.asarray(g.addressable_data(0))
    assert np.isfinite(gv).all()

    # host_tree on a cross-host SHARDED leaf -> process_allgather branch
    p = jax.device_put(np.arange(4, dtype=np.float32),
                       NamedSharding(mesh, P("data")))
    assert not p.is_fully_addressable and not p.is_fully_replicated
    ht = host_tree({"p": p, "w": w})
    assert np.allclose(ht["p"], np.arange(4.0)), ht["p"]
    # replicated leaf takes the local-copy fast path
    assert np.allclose(ht["w"], 1.0)

    distributed.barrier("test2-end")
    print(f"proc {pid}: ok data+ckpt")
""")


def test_two_process_data_and_checkpoint_paths(tmp_path):
    """device_put of a host-global batch onto a cross-process sharding (the
    prefetch_to_device path) and host_tree's allgather branch for FSDP-sharded
    state — the multi-host behaviors the single-process suite cannot reach."""
    port = _free_port()
    script = tmp_path / "worker2.py"
    script.write_text(WORKER2)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(JAX_PLATFORMS="cpu",
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   PYTHONPATH=REPO)
        procs.append(subprocess.Popen([sys.executable, str(script)], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: ok data+ckpt" in out
