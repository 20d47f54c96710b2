"""Multi-process (multi-host) entry points: jax.distributed + global mesh.

The reference scales construction across machines with MPI ranks
(/root/reference/src/mpi/mpi_utils.hh:148-218 MPI_handler init/finalize;
femto_index runs under mpirun).  The TPU equivalent is jax.distributed:
every process runs the SAME program over a global mesh; the shard_map
collectives that carry the build ride ICI within a host and DCN across
hosts, with no code changes to the build itself.

Typical multi-host launch (one process per host):

    from femto_tpu.parallel import distributed as ftd
    ftd.initialize()                 # env-driven (TPU pods) or explicit
    mesh = ftd.global_mesh()
    index = build_index_sharded(prepared, mesh)

CPU testing uses two localhost processes with gloo collectives
(tests/test_multiprocess.py), mirroring the reference's mpirun-on-one-host
test strategy (SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: Optional[str] = None) -> None:
    """Initialize jax.distributed.  With no arguments, TPU pod environments
    auto-discover; pass explicit values for manual launches.

    cpu_collectives: set to "gloo" for multi-process CPU runs (tests)."""
    import jax

    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "bins"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def put_global(arr, sharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain device_put.  Multi-process: every process holds
    the full host array and materializes only its addressable shards (for
    production multi-host corpus loading, feed per-host slices through
    jax.make_array_from_process_local_data instead)."""
    import jax

    arr_np = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr_np, sharding)
    return jax.make_array_from_callback(
        arr_np.shape, sharding, lambda idx: arr_np[idx]
    )
