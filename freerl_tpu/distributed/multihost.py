"""Multi-host launch glue (SURVEY §5.8: jax.distributed per host, one mesh
over all chips, psum gradient sync over ICI, host-local env stepping).

The reference has no distributed backend at all; this module is the
TPU-native scale-out path mandated by BASELINE.json. The design keeps DCN
off the hot path:

  - each host calls :func:`initialize` (coordinator address from the TPU
    pod metadata or args), then builds ONE global mesh over every chip;
  - env batches and replay shards are created per-device via shard_map
    (distributed/dp.py) so experience NEVER crosses hosts;
  - the only cross-host traffic is the gradient pmean, which XLA lowers
    to an all-reduce riding ICI within a slice (DCN only between slices);
  - metrics reduce with the same collective, so every host logs identical
    scalars and host 0 writes artifacts.

Single-host behavior is the identity (initialize() is a no-op when no
coordinator is configured), so the same training script runs anywhere.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the jax.distributed cluster; no-op for single-host runs.

    On TPU pods the three arguments resolve automatically from the
    environment; pass them explicitly for CPU/GPU multi-process tests
    (e.g. num_processes=2 with JAX_PLATFORMS=cpu for a fake backend).
    Returns True if distributed mode was initialized.
    """
    explicit = coordinator_address is not None
    # auto-init only on real multi-host pods (>1 worker hostname);
    # single-host images may set TPU_WORKER_HOSTNAMES=localhost
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_pod = len([w for w in workers.split(",") if w]) > 1 or (
        "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if not (explicit or auto_pod):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis: str = "dp"):
    """One mesh over every chip of every host (dp axis)."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devs = mesh_utils.create_device_mesh((jax.device_count(),))
    return Mesh(devs, (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0


def hosts() -> int:
    return jax.process_count()
