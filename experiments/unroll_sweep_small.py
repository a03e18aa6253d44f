"""Unroll sweep for the dispatch-bound small solvers (VERDICT r2 #2):
lasso-skinny 4096x1024, LP affine n=1024, QP-standard affine n=1024,
at K in {4, 16, 64}.  Decides the unroll='auto' resolution table.

Each timed number is best-of-3 full runs (domaxiters) after a compile
warm-up with host materialization (see benchmarks/matrix.py:_run_twice).
"""

import time

import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.lasso import lasso
from admm_tpu.models.linearprogram import linearprogram
from admm_tpu.models.quadraticprogram import quadraticprogram

rng = np.random.default_rng(0)


def time_solver(name, fn, iters, Ks=(4, 16, 64)):
    for K in Ks:
        cfg = ADMMConfig(maxiters=iters, domaxiters=True, unroll=K)
        t0 = time.perf_counter()
        np.asarray(fn(cfg).steps)  # compile + host materialization
        tc = time.perf_counter() - t0
        best = min(fn(cfg).runtime for _ in range(3))
        print(f"{name:24s} K={K:3d} {iters / best:9.0f} iter/s "
              f"{best / iters * 1e6:7.2f} us/iter  (compile {tc:.0f}s)",
              flush=True)


# lasso skinny 4096x1024 (matrix row shapes)
m, n = 4096, 1024
D = rng.standard_normal((m, n)).astype(np.float32)
s = (D @ (rng.standard_normal(n) * (rng.random(n) < 0.1))
     + 0.1 * rng.standard_normal(m)).astype(np.float32)
lam = float(0.1 * np.max(np.abs(D.T @ s)))
time_solver("lasso_skinny", lambda cfg: lasso(D, s, lam, cfg), 2000)

# LP affine n=1024 (matrix row construction)
nlp = 1024
Dlp = rng.standard_normal((nlp, nlp)).astype(np.float32)
xt = np.abs(rng.standard_normal(nlp)).astype(np.float32)
slp = Dlp @ xt
blp = rng.standard_normal(nlp).astype(np.float32)
time_solver("linearprogram_affine",
            lambda cfg: linearprogram(blp, Dlp, slp, cfg), 1000)

# QP standard n=1024
nq = 1024
A0 = rng.standard_normal((nq, nq)).astype(np.float32)
P = (A0 @ A0.T / nq + np.eye(nq)).astype(np.float32)
q = rng.standard_normal(nq).astype(np.float32)
Dq = rng.standard_normal((nq, nq)).astype(np.float32)
xq = np.abs(rng.standard_normal(nq)).astype(np.float32)
sq = Dq @ xq
time_solver("qp_standard_affine",
            lambda cfg: quadraticprogram(P, q, 0.0, Dq, sq, cfg), 1000)
