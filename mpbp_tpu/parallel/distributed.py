"""Multi-host (multi-process) initialization and mesh construction.

SURVEY.md section 2.4 item 4 / BASELINE configs[4]: 1024^2-2048^2 grids
row-partitioned across N >= 2 hosts. The reference's requirements pin mpi4py
(reference requirements.txt:11) but never import it — PETSc's transitive MPI
slot. Here the multi-process backend is JAX's native distributed runtime:
one `jax.distributed.initialize` per process, after which `jax.devices()`
is the GLOBAL device list and every sharded program in this package
(parallel/sharding.py, parallel/halo.py, solvers/gmres.py) runs unchanged —
XLA routes neighbor halo permutes over ICI within a host/slice and the
Arnoldi all-reduces over DCN across hosts.

Cross-host solver guidance: use `orthog="cgs1"` (the pipelined single-
reduction Arnoldi, solvers/gmres.py) in sharded_solve — with DCN reduction
latency rivaling the local matvec, halving the reductions per iteration is
the difference between compute-bound and latency-bound (the rationale is
Ghysels & Vanroose-style communication avoidance; see gmres.py docstring).

Process launch contract (same shape as jax.distributed.initialize):
  coordinator_address  "host:port" of process 0 (env MPBP_COORDINATOR)
  num_processes        total process count      (env MPBP_NUM_PROCS)
  process_id           this process's rank      (env MPBP_PROC_ID)
On TPU pods all three are auto-detected from the TPU runtime metadata and
may be omitted. On CPU (testing / this container) they are required, and
the gloo collectives backend is selected automatically.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> dict:
    """Initialize this process's slot in the global JAX runtime.

    Arguments default to the MPBP_COORDINATOR / MPBP_NUM_PROCS /
    MPBP_PROC_ID environment variables, then to JAX's own auto-detection
    (which works on real TPU pods). Returns a summary dict
    {process_id, num_processes, global_devices, local_devices}.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "MPBP_COORDINATOR")
    if num_processes is None and "MPBP_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["MPBP_NUM_PROCS"])
    if process_id is None and "MPBP_PROC_ID" in os.environ:
        process_id = int(os.environ["MPBP_PROC_ID"])

    on_cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    if (on_cpu and coordinator_address is None and num_processes is None):
        # single CPU process: nothing to initialize (argument-less
        # auto-detection is a TPU-runtime feature; on CPU it would try to
        # adopt whatever stale coordinator the environment points at)
        pass
    elif not jax.distributed.is_initialized():
        # CPU multi-process needs the gloo collectives implementation; on
        # TPU the flag is ignored (ICI/DCN transport is the XLA runtime's).
        if on_cpu:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }


def fetch_replicated(x) -> np.ndarray:
    """Host value of a REPLICATED global array (solver scalars: iters,
    relres, converged). Multi-process jax refuses plain float()/np.asarray()
    on any array spanning non-addressable devices; for replicated values the
    local shard IS the value."""
    if hasattr(x, "addressable_shards"):
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def global_mesh_1d(axis: str = "x") -> Mesh:
    """1-D mesh over ALL global devices, process-major — a contiguous band
    of grid rows per device, with each host owning a contiguous super-band
    (so the +-1-row halos cross DCN only at the host seams)."""
    return Mesh(np.array(jax.devices()), axis_names=(axis,))


def global_mesh_2d(axes: tuple[str, str] = ("dcn", "ici")) -> Mesh:
    """2-D (hosts, devices-per-host) mesh. Shard grid rows over BOTH axes
    with PartitionSpec((axes[0], axes[1]), ...) for the 1-D row partition,
    or keep a second tensor axis on `ici` for 2-D domain decomposition.
    jax.devices() is process-major, so rows [h * per_host + d] place host
    seams exactly at the dcn boundaries."""
    n_hosts = jax.process_count()
    per_host = len(jax.devices()) // n_hosts
    devs = np.array(jax.devices()).reshape(n_hosts, per_host)
    return Mesh(devs, axis_names=axes)
