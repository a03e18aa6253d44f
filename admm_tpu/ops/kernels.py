"""Pallas TPU kernels for the engine's hot elementwise path.

The ADMM tail of every iteration — z-prox (soft-threshold) followed by the
dual update — reads x and u and writes z and u.  Fusing both updates into
one VMEM pass halves the HBM round-trips for the vector state relative to
running them as separate XLA ops when the compiler does not fuse across
the two (the matvec streams still dominate for large problems; this
kernel removes the residual vector traffic and is the integration point
for further fused iteration kernels).

    z = sign(x + u) * max(|x + u| - t, 0)
    u = u + x - z

Shapes are padded to the f32 VPU tile (8 x 128) and processed in
(block, 128) tiles.  On non-TPU backends (CPU tests) the public entry
falls back to the identical jnp computation — same math, same results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128
_SUBLANE = 8
_BLOCK_ROWS = 512  # rows of 128 lanes per grid step (256 KB per buffer)


def _fused_jnp(x, u, t):
    v = x + u
    z = jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)
    return z, u + x - z


def _kernel(x_ref, u_ref, t_ref, z_ref, unew_ref):
    x = x_ref[:]
    u = u_ref[:]
    t = t_ref[0]
    v = x + u
    z = jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)
    z_ref[:] = z
    unew_ref[:] = u + x - z


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pallas(x2, u2, t, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = x2.shape[0]
    block = min(_BLOCK_ROWS, rows)
    grid = (rows // block,)
    spec = pl.BlockSpec((block, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    z2, u2n = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            jax.ShapeDtypeStruct(u2.shape, u2.dtype),
        ),
        interpret=interpret,
    )(x2, u2, t.reshape(1))
    return z2, u2n


def fused_soft_threshold_dual(x, u, t, *, force_pallas=False):
    """Fused  z = soft_threshold(x + u, t);  u' = u + x - z.

    Pallas on TPU; identical jnp math elsewhere (XLA fuses it there).
    ``t`` may be a traced scalar (e.g. lam/rho with adaptive rho).
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or force_pallas):
        return _fused_jnp(x, u, t)

    n = x.shape[0]
    chunk = _SUBLANE * _LANE
    padded = int(np.ceil(n / chunk)) * chunk
    rows = padded // _LANE
    if rows > _BLOCK_ROWS and rows % _BLOCK_ROWS:
        # Pad the row count to a whole number of grid blocks.
        rows = int(np.ceil(rows / _BLOCK_ROWS)) * _BLOCK_ROWS
        padded = rows * _LANE
    x2 = jnp.zeros((rows, _LANE), x.dtype).reshape(-1).at[:n].set(x).reshape(rows, _LANE)
    u2 = jnp.zeros((rows, _LANE), u.dtype).reshape(-1).at[:n].set(u).reshape(rows, _LANE)
    t = jnp.asarray(t, x.dtype)
    z2, u2n = _fused_pallas(x2, u2, t, interpret=not on_tpu)
    return z2.reshape(-1)[:n], u2n.reshape(-1)[:n]
