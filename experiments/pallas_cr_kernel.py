"""Prototype: batched masked cyclic-reduction solve as ONE Pallas kernel.

The XLA masked CR streams the (B, N) rhs and the (N,) level coefficients
from HBM at every one of 2 log2(n) levels (~400 MB per batched solve at
B=128, n=8192).  This kernel runs ALL levels inside one pallas_call:
the rhs block and every level's coefficients stay VMEM-resident, so the
HBM traffic collapses to one load + one store of each (~21 MB) — a ~19x
byte reduction if Mosaic handles the per-level static shifts well.

Layout: grid over B in sublane chunks (8 rows per step); coefficient
blocks use constant index maps so Mosaic loads them once and keeps them
resident across grid steps.  Shifts b_{i±s} are pltpu.roll with an
explicit iota mask for the wrapped lanes (static s per level, python
loop unrolled at trace time).  Divisions are precomputed reciprocals.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/pallas_cr_kernel.py [--tpu]
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128
_SUB = 8


def build_coeffs(dl, d, du):
    """Masked-CR elimination state packed for the kernel: (L, Np) f32
    stacks (alphas, betas, a, c, dinv, mask_f, mask_b), Np = lane-padded
    2^L - 1.  Host-side, f64 precompute (mirrors
    ops/tridiag.CyclicReductionSolver.from_tridiag)."""
    from admm_tpu.ops.tridiag import CyclicReductionSolver

    sol = CyclicReductionSolver.from_tridiag(dl, d, du)
    L, N = sol.alphas.shape
    Np = -(-N // _LANE) * _LANE

    def pad(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return np.pad(a, ((0, 0), (0, Np - N)), constant_values=fill)

    alphas = pad(sol.alphas)
    betas = pad(sol.betas)
    a_lv = pad(sol.a_lv)
    c_lv = pad(sol.c_lv)
    dinv = pad(1.0 / np.asarray(sol.d_lv), fill=1.0)
    mf = pad(np.asarray(sol.masks_f, np.float32))
    mb = pad(np.asarray(sol.masks_b, np.float32))
    return (alphas, betas, a_lv, c_lv, dinv, mf, mb), sol.n, N, Np, L


def _kernel(L, N, b_ref, al_ref, be_ref, a_ref, c_ref, di_ref, mf_ref,
            mb_ref, x_ref):
    from jax.experimental.pallas import tpu as pltpu

    Np = b_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    b = b_ref[:]

    def up(v, s):
        # v_{i-s}: roll right, zero the wrapped first s lanes.
        return pltpu.roll(v, s, 1) * (lane >= s).astype(v.dtype)

    def dn(v, s):
        # v_{i+s}: roll left, zero the wrapped last s lanes (also kills
        # contributions from the padding region beyond N).
        return pltpu.roll(v, Np - s, 1) * (lane < N - s).astype(v.dtype)

    for l in range(L):
        s = 1 << l
        mf = mf_ref[l, :][None, :]
        upd = b - al_ref[l, :][None, :] * up(b, s) \
                - be_ref[l, :][None, :] * dn(b, s)
        b = mf * upd + (1.0 - mf) * b

    x = jnp.zeros_like(b)
    for l in range(L - 1, -1, -1):
        s = 1 << l
        mb = mb_ref[l, :][None, :]
        num = (b - a_ref[l, :][None, :] * up(x, s)
                 - c_ref[l, :][None, :] * dn(x, s)) * di_ref[l, :][None, :]
        x = mb * num + (1.0 - mb) * x

    x_ref[:] = x


@functools.partial(jax.jit, static_argnames=("L", "N", "interpret"))
def cr_solve_pallas(b2, coeffs, L, N, interpret=False):
    """Solve for a (B, Np) batch of rhs (B a multiple of 8)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    al, be, a, c, di, mf, mb = coeffs
    B, Np = b2.shape
    grid = (B // _SUB,)
    bspec = pl.BlockSpec((_SUB, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    # Constant index map: loaded once, resident across grid steps.
    cspec = pl.BlockSpec((L, Np), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, L, N),
        grid=grid,
        in_specs=[bspec] + [cspec] * 7,
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((B, Np), jnp.float32),
        interpret=interpret,
    )(b2, al, be, a, c, di, mf, mb)


def main():
    import sys

    on_tpu = "--tpu" in sys.argv
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    for n, B in ((300, 8), (8192, 128)) if on_tpu else ((300, 8), (1000, 16)):
        rho = 1.0
        diag = 1.0 + rho * np.r_[1.0, 2.0 * np.ones(n - 1)]
        off = -rho * np.ones(n)
        dl, du = np.r_[0.0, off[1:]], np.r_[off[:-1], 0.0]
        coeffs_np, n_true, N, Np, L = build_coeffs(dl, diag, du)
        coeffs = tuple(jnp.asarray(v) for v in coeffs_np)

        Bb = rng.standard_normal((B, n)).astype(np.float32)
        b2 = jnp.asarray(np.pad(Bb, ((0, 0), (0, Np - n))))

        T = np.diag(diag) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
        want = np.linalg.solve(T, Bb.T.astype(np.float64)).T

        x = cr_solve_pallas(b2, coeffs, L, N, interpret=not on_tpu)
        got = np.asarray(x)[:, :n]
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        print(f"n={n} B={B}: kernel rel-err vs dense {err:.2e}", flush=True)
        assert err < 5e-5, err

        if on_tpu:
            # A/B vs the XLA masked solve: K chained solves INSIDE one
            # jit (the engine's loop regime), so per-call dispatch
            # cannot dominate; host-sync after warm (relay gotcha).
            from functools import partial

            from admm_tpu.ops.tridiag import CyclicReductionSolver

            sol = CyclicReductionSolver.from_tridiag(dl, diag, du)
            bj = jnp.asarray(Bb)
            K = 50

            @jax.jit
            def xla_chain(v):
                def body(i, v):
                    return jax.vmap(sol.solve)(v) * (1.0 + 1e-9)
                return jax.lax.fori_loop(0, K, body, v)

            @jax.jit
            def pallas_chain(v):
                def body(i, v):
                    out = cr_solve_pallas(v, coeffs, L, N)
                    return out * (1.0 + 1e-9)
                return jax.lax.fori_loop(0, K, body, v)

            np.asarray(xla_chain(bj))        # warm + HOST sync
            np.asarray(pallas_chain(b2))

            res = {"xla": [], "pallas": []}
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(xla_chain(bj))
                res["xla"].append((time.perf_counter() - t0) / K)
                t0 = time.perf_counter()
                jax.block_until_ready(pallas_chain(b2))
                res["pallas"].append((time.perf_counter() - t0) / K)
            for k, ts in res.items():
                print(f"n={n} B={B} {k:7s} best {min(ts)*1e6:9.1f} us/solve "
                      f"med {sorted(ts)[2]*1e6:9.1f}", flush=True)


if __name__ == "__main__":
    main()
