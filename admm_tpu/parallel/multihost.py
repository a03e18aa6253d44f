"""Multi-host cluster initialization.

The reference's communication backend is a single-machine MATLAB worker
pool (gcp; admm.m:347-356).  The TPU-native equivalent for scaling past
one host is jax.distributed: every host calls ``initialize_cluster()``
before touching devices, after which ``jax.devices()`` spans the whole
pod slice and the distributed solvers in this package (consensus,
transpose reduction, sliced prox) work unchanged — their meshes simply
cover more devices, with collectives riding ICI within a slice and DCN
across hosts.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_cluster(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (no-op on a single host or under a TPU
    runtime that auto-configures).  Returns the global device count.

    On Cloud TPU pods the arguments are auto-detected from the
    environment; pass them explicitly for manual clusters.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def global_mesh(axis_name: str = "shards"):
    """A 1-D mesh over every device in the cluster (call after
    ``initialize_cluster``)."""
    from .mesh import make_mesh

    return make_mesh(axis_name=axis_name)
