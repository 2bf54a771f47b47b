"""Two-process jax.distributed bring-up (VERDICT r1 item 6).

Spawns two fresh CPU-only python processes that rendezvous through a
localhost coordinator, build a global mesh spanning both processes'
devices, and run one psum-reducing sharded computation on a global array
assembled from per-process local shards — the multi-host pattern
parallel/distributed.py exists for, previously only exercised as a no-op.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, '@REPO@')
from iswm_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    process_local_batch_slice,
)

ok = maybe_initialize_distributed(
    coordinator_address='@COORD@',
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert ok, "distributed init did not reach multi-process mode"

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()          # 2 hosts x 2
assert len(jax.local_devices()) == 2
assert process_local_batch_slice(8) == 4

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
sharding = NamedSharding(mesh, P("data"))

# per-process local shard of a global [4, 8] array whose rows are the
# global device index
pid = jax.process_index()
local = [
    jax.device_put(jnp.full((1, 8), 2 * pid + i, jnp.float32), d)
    for i, d in enumerate(jax.local_devices())
]
global_arr = jax.make_array_from_single_device_arrays((4, 8), sharding, local)

@jax.jit
def total(x):
    return jnp.sum(x)  # lowers to a cross-process psum over the mesh

val = float(total(global_arr))
assert val == (0 + 1 + 2 + 3) * 8, val

f = jax.shard_map(
    lambda x: jax.lax.psum(jnp.sum(x), "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P(),
)
val2 = float(jax.jit(f)(global_arr))
assert val2 == val, (val2, val)
print(f"proc {pid} OK: global sum {val}")
"""


def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@REPO@", repo).replace("@COORD@", coord))

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK: global sum 48.0" in out
