"""Multi-host runtime initialization and mesh construction.

The reference is a single-process CPU library (SURVEY.md §5.8 — it has no
distributed machinery at all); the multi-host dimension of this framework
comes from the north star (BASELINE.json): MSM/pairing workloads sharded
over a pod slice.  On TPU pods, each host owns a subset of chips and all
hosts run the same SPMD program; JAX needs one coordinator handshake
(`jax.distributed.initialize`) before `jax.devices()` shows the global
device set.

Usage (one call at process start, before any jax computation):

    from mathlib_tpu.parallel import backend
    backend.init_multihost()                 # TPU pods: auto-detected
    backend.init_multihost(coordinator_address="host0:1234",
                           num_processes=4, process_id=rank)  # explicit
    mesh = backend.global_mesh()             # 1-D "data" mesh, all chips

Single-host (or CPU virtual-device) runs skip the handshake and degrade
to `jax.devices()` — so the same entry code works in tests, on one chip,
and on a pod.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

_INITIALIZED = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host runtime; returns True if a handshake happened.

    With no arguments, relies on JAX's cluster auto-detection (TPU pod
    metadata, or the standard JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    JAX_PROCESS_ID env vars).  A single-process environment — no
    coordinator configured and no pod metadata — is detected and skipped
    rather than raised, so callers can run the same code everywhere.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return False
    import os

    has_env = coordinator_address is not None or (
        "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
        or os.path.exists("/dev/vfio")  # real TPU host: pod metadata works
    )
    if not has_env:
        # Single-process environment.  Deliberately do NOT probe
        # jax.process_count() here: that instantiates the backend client,
        # after which a later jax.distributed.initialize can no longer
        # attach (executed for real by tests/test_multihost.py).
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # pragma: no cover - env-dependent
        # Absorb an externally pre-initialized runtime (user code called
        # jax.distributed.initialize before us): same entry code runs
        # everywhere, and the existing handshake is reused.
        if "already initialized" not in str(e):
            raise
        _INITIALIZED = True
        return False
    _INITIALIZED = True
    return True


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this named barrier.

    Runs on the coordination service (TCP to the coordinator), NOT on the
    collective fabric — safe to call before any collective executes, and
    with a generous timeout so ranks whose first compile is slow (e.g.
    an AOT cache miss costing minutes) don't blow the transport's short
    connect window when they finally meet at the first collective."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # single-process: nothing to wait for
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every addressable chip in the (possibly multi-host)
    job.  Device order follows `jax.devices()`, which JAX arranges so that
    neighboring mesh positions are ICI neighbors on TPU slices — the
    point-add all-reduces in parallel/msm.py ride ICI, not DCN."""
    import numpy as np

    devs = np.asarray(jax.devices())
    return Mesh(devs, (axis,))


def runtime_info() -> dict:
    """Process/device topology snapshot (for logs and the scaling report)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
