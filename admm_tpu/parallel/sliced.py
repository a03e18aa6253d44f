"""Engine-generic sliced proximal updates.

The reference's `options.parallel in {'xminf','zming','both'}` wraps the
user prox in parproxf/parproxg, parfor-ing over user-declared slices of
the variable with the full (x, z, u) broadcast to each worker and the
slice results gathered (admm.m:343-467).

TPU design: the same contract — a per-slice prox
``prox_slice(x, z, u, rho, k) -> slice_k of the result`` — is compiled
into a single shard_map over a 1-D mesh: every device holds the full
replicated iterates (the reference's broadcast, now free: state already
lives on-device), computes its own slice, and the stacked out-spec is the
reference's cell2mat gather (admm.m:434) with no host round-trip.

Slices must be equal-length (static shapes); pad the variable if needed.
The resulting prox is a plain ``prox(x, z, u, rho)`` usable directly with
the core engine — slicing composes with every engine feature.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import make_mesh


def make_sliced_prox(
    prox_slice: Callable,
    slice_len: int,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build an engine-compatible prox from a per-slice prox.

    ``prox_slice(x, z, u, rho, k)`` receives the FULL iterates plus the
    slice index k (the reference's xminfi(x, z, u, rho, k) contract,
    admm.m:416-436) and must return an array of shape (slice_len,).
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]

    def sharded(x, z, u, rho):
        k = jax.lax.axis_index(axis)
        out = prox_slice(x, z, u, rho, k)
        return out.reshape(1, slice_len)

    kwargs = dict(
        mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(axis)
    )
    try:  # new API (jax.shard_map): replication check renamed
        fn = shard_map(sharded, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover — older jax
        fn = shard_map(sharded, check_rep=False, **kwargs)

    def prox(x, z, u, rho):
        return fn(x, z, u, jnp.asarray(rho)).reshape(-1)

    return prox
