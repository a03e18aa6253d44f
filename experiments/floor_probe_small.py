"""Device-floor probe for the dispatch-bound small solvers (VERDICT r2
weak #3): measure XLA's OWN floor for each solver's dominant GEMV at the
matrix-bench shapes, next to the full-engine rate, so the matrix can
report an honest pct-of-floor instead of a naive two-stream roofline.

The floor program is a bare fori_loop running only the x-update GEMV
(K=16 sub-iterations per step, matching the engine's unroll): everything
above it (projection/soft-threshold, dual update, Boyd norms, history
writes) is the 'body tail' the engine adds.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.lasso import lasso
from admm_tpu.models.linearprogram import linearprogram
from admm_tpu.models.quadraticprogram import quadraticprogram

rng = np.random.default_rng(0)


@partial(jax.jit, static_argnums=(2, 3))
def gemv_loop(M, v0, iters, K):
    """iters GEMVs through M (shape (out, in) with out==in required for
    chaining; rectangular M is folded via a slice)."""
    n = v0.shape[0]

    def sub(v):
        w = M @ jnp.concatenate([v, v])[: M.shape[1]] if M.shape[1] != n else M @ v
        return w[:n] / jnp.float32(1.0001)

    def body(i, v):
        for _ in range(K):
            v = sub(v)
        return v

    return jax.lax.fori_loop(0, iters // K, body, v0)


def time_floor(name, out_dim, in_dim, iters=2000, K=16):
    M = jnp.asarray(rng.standard_normal((out_dim, in_dim)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(out_dim).astype(np.float32))
    np.asarray(gemv_loop(M, v0, iters, K))  # compile + materialize
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(gemv_loop(M, v0, iters, K))
        best = min(best, time.perf_counter() - t0)
    print(f"floor {name:22s} ({out_dim}x{in_dim})  "
          f"{iters / best:9.0f} iter/s {best / iters * 1e6:7.2f} us/iter",
          flush=True)
    return best / iters


def time_engine(name, fn, iters, K):
    cfg = ADMMConfig(maxiters=iters, domaxiters=True, unroll=K)
    np.asarray(fn(cfg).steps)
    best = min(fn(cfg).runtime for _ in range(3))
    print(f"engine {name:21s} K={K:3d} {iters / best:9.0f} iter/s "
          f"{best / iters * 1e6:7.2f} us/iter", flush=True)
    return best / iters


# --- lasso skinny 4096x1024: x-update is one 1024x1024 GEMV (Minv @ rhs)
m, n = 4096, 1024
D = rng.standard_normal((m, n)).astype(np.float32)
s = (D @ (rng.standard_normal(n) * (rng.random(n) < 0.1))
     + 0.1 * rng.standard_normal(m)).astype(np.float32)
lam = float(0.1 * np.max(np.abs(D.T @ s)))
f = time_floor("lasso_skinny_xgemv", 1024, 1024)
e = time_engine("lasso_skinny", lambda cfg: lasso(D, s, lam, cfg), 2000, 16)
print(f"  -> pct_of_floor {100 * f / e:.1f}%\n", flush=True)

# --- LP affine n=1024: x-update is one 1024x2048 GEMV (K1 @ [b1; x0-ish])
nlp = 1024
Dlp = rng.standard_normal((nlp, nlp)).astype(np.float32)
xt = np.abs(rng.standard_normal(nlp)).astype(np.float32)
slp = Dlp @ xt
blp = rng.standard_normal(nlp).astype(np.float32)
f = time_floor("lp_affine_xgemv", 1024, 2048)
for K in (1, 16):
    e = time_engine("linearprogram_affine",
                    lambda cfg: linearprogram(blp, Dlp, slp, cfg), 1000, K)
print(f"  -> pct_of_floor {100 * f / e:.1f}%\n", flush=True)

# --- QP standard n=1024: same GEMV shape as LP
nq = 1024
A0 = rng.standard_normal((nq, nq)).astype(np.float32)
P = (A0 @ A0.T / nq + np.eye(nq)).astype(np.float32)
q = rng.standard_normal(nq).astype(np.float32)
Dq = rng.standard_normal((nq, nq)).astype(np.float32)
sq = Dq @ np.abs(rng.standard_normal(nq)).astype(np.float32)
for K in (1, 16):
    e = time_engine("qp_standard_affine",
                    lambda cfg: quadraticprogram(P, q, 0.0, Dq, sq, cfg),
                    1000, K)
print(f"  -> pct_of_floor {100 * f / e:.1f}%", flush=True)
