"""Multi-host (pod-slice) scale-out scaffold.

The reference is single-process (OpenMP only — SURVEY.md §2 'Parallelism &
communication', §5 'Distributed communication backend'); its TPU-native
equivalent is scenario-batch data parallelism over a (dcn, ici) device
mesh: `jax.distributed` for multi-host runtime bring-up, one NamedSharding
over the batch axis, XLA collectives (psum on ICI/DCN) only for metric
reductions — the per-scenario solve path is communication-free, which is
what makes >=80% multi-host scaling efficiency (BASELINE.json target #2)
structurally achievable.

Usage (per host):
    from idocp_tpu.parallel import distributed as dist
    dist.initialize()                      # no-op single-process
    mesh = dist.make_pod_mesh()            # ('dcn', 'ici') mesh
    bs = BatchedSolver(solver, mesh=mesh)  # batch sharded over both axes
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-host JAX runtime (reference: none — single
    process; TPU-native: jax.distributed over DCN). No-op when running
    single-process (the common dev/test path) or when already initialized.

    Must not touch any backend-initializing JAX API before
    jax.distributed.initialize (jax.process_count() counts — it
    initializes the XLA backend, after which distributed bring-up is
    rejected; round-5 fix found by the two-process smoke test), so the
    already-initialized check reads the distributed client state
    directly.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    try:
        from jax._src import distributed as _dist_state
        if _dist_state.global_state.client is not None:
            return  # already initialized by the launcher
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_pod_mesh(axis_dcn: str = "dcn", axis_ici: str = "ici") -> Mesh:
    """2-D (hosts × local-chips) mesh: the leading axis crosses DCN
    (process boundaries), the trailing axis stays on ICI. Collapses to
    (1, n_devices) single-host."""
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(grid, (axis_dcn, axis_ici))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scenario batch axis sharded over every mesh axis (pure DP)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def scaling_report(step_fn: Callable, make_batch: Callable[[int], tuple],
                   batch_per_device: int, iters: int = 10,
                   warmup: int = 1) -> dict:
    """Measure solves/s at 1 device vs all devices and the resulting
    scaling efficiency (BASELINE 'scaling efficiency at 1 chip / N').

    step_fn(*args) -> updated first arg (blocking handled here);
    make_batch(n_scenarios) -> args tuple with leading batch axes sized n.
    """
    devs = jax.devices()
    results = {}
    for label, n_dev in (("1_device", 1), (f"{len(devs)}_devices",
                                           len(devs))):
        n = batch_per_device * n_dev
        mesh = Mesh(np.asarray(devs[:n_dev]), ("dp",))
        shard = NamedSharding(mesh, P("dp"))
        args = make_batch(n)
        args = tuple(
            jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), a)
            if i == 0 else a for i, a in enumerate(args))
        out = step_fn(*args)  # compile + shard settle
        for _ in range(warmup):
            out = step_fn(out, *args[1:])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_fn(out, *args[1:])
        jax.block_until_ready(out)
        wall = time.perf_counter() - t0
        results[label] = n * iters / wall
    base = results["1_device"]
    full = results[f"{len(devs)}_devices"]
    results["scaling_efficiency"] = full / (base * len(devs))
    return results
