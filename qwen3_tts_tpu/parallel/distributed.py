"""Multi-host (DCN) initialization glue.

The sharding layer (parallel.mesh) is already expressed entirely through
NamedSharding + collectives, so extending data-parallel serving across
hosts only needs (1) jax.distributed initialization and (2) a mesh that
spans all processes' devices with the data axis outermost — DP requires no
collectives at all here (each stream's KV/codec/sampling state is
row-local), so the cross-host axis rides DCN without any traffic, and TP
stays inside each host's ICI domain.

Single-process usage is a no-op: every helper degrades to local devices.

Launch (one process per host):
    JAX_COORDINATOR=host0:1234 NPROC=4 PROC_ID=k python -m ... serve
or rely on the TPU pod runtime's automatic environment (jax.distributed
reads it natively when no arguments are given).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    Arguments default from JAX_COORDINATOR / NPROC / PROC_ID env vars; with
    nothing set and a single process, this is a no-op returning False.
    Safe to call twice (second call is ignored).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or int(os.environ.get("NPROC", "0")) or None
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("PROC_ID", "-1")))
    if coordinator is None and num_processes is None:
        # TPU pod runtimes provide discovery env; only initialize when it
        # looks like a real multi-process launch
        if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is None:
            return False
        try:
            jax.distributed.initialize()
            return True
        except (RuntimeError, ValueError):
            return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=max(process_id, 0))
        return True
    except RuntimeError:
        return jax.process_count() > 1   # already initialized


def make_serving_mesh(model_parallel: int = 1) -> Mesh:
    """Global (data, model) mesh over every device of every process.

    data = hosts x local chips / model_parallel (the serving scale axis,
    DCN-safe: zero collectives cross the data axis); model = `model_parallel`
    chips of tensor parallelism, kept inside one host's ICI domain.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    local = jax.local_device_count()
    if model_parallel > local:
        raise ValueError(
            f"model_parallel={model_parallel} exceeds the {local} devices "
            "of one host — TP collectives must stay on ICI, not DCN")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def local_lane_slice(mesh: Mesh, total_lanes: int) -> slice:
    """The [lo, hi) slice of global batch lanes this process feeds (batch
    rows are data-sharded; each host materializes only its own rows)."""
    per = total_lanes // jax.process_count()
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
