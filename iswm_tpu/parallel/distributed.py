"""Multi-host (pod) initialization.

The reference is strictly single-process (SURVEY §2.8); scaling past one
host here uses JAX's standard multi-controller runtime: every host runs
the same program, ``jax.distributed.initialize`` performs the rendezvous,
and the global mesh spans all hosts' devices (collectives ride ICI within
a slice, DCN across slices).

Call ``maybe_initialize_distributed()`` before any other JAX use.  It is a
no-op unless multi-host env vars are present (Cloud TPU pods set these
automatically; for manual bring-up set JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-controller runtime when configured.

    Returns True if distributed mode was initialized.  Explicit args win
    over env vars; with neither, single-process mode is kept.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    on_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")) and not bool(
        os.environ.get("PALLAS_AXON_POOL_IPS")  # the dev tunnel is 1 chip
    )
    if coordinator_address is None and not on_tpu_pod:
        return False
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:  # Cloud TPU pod: args are discovered from the metadata env
            jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception as e:
        print(f"distributed init skipped ({e}); continuing single-process")
        return False


def process_local_batch_slice(global_batch: int) -> int:
    """Per-host slice of a global batch (data-parallel input pipelines feed
    each host its own shard)."""
    import jax

    if global_batch % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes"
        )
    return global_batch // jax.process_count()
