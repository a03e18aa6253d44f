"""Per-solver TPU performance + f32 accuracy matrix.

The reference's benchmark rig is solvertester's runtime-vs-scale sweep
(testers/solvertester.m:243-263), which publishes no numbers.  This
module measures, on the real chip:

  * TIMING: ADMM iterations/sec for every solver family at
    production-ish shapes (fixed iteration count, domaxiters, loop-only
    wall clock after a compile warm-up), plus an HBM stream estimate —
    bytes streamed per iteration / peak HBM bandwidth.  The
    %-of-roofline column is reported ONLY where that byte model is
    valid: unrolled bodies whose operands fit VMEM amortize HBM traffic
    across sub-iterations (the resident regime) and are instead
    annotated, since their floor is the kernel-issue rate
    (docs/RESULTS.md round-3 floor probes), not bandwidth.
  * ACCURACY: each solver's randomized oracle tester (testers/problems,
    same constructions as the reference testers) run on-device — inputs
    cast to f32 on TPU — with the truth/criteria still computed on host
    in f64 numpy.  This is the evidence that the f32 perf mode is
    usable per solver (the CPU oracle suite runs f64-only).

Run:  python bench.py --matrix   (or python -m admm_tpu.benchmarks.matrix)
Writes BENCH_MATRIX.json at the repo root and prints one summary JSON
line per row.
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import numpy as np

# Peak HBM bandwidth per chip for the roofline column (v5e: 819 GB/s).
_HBM_GBPS = 819.0

# ---- contention control (VERDICT r4 weak #3) -------------------------------
# The tunneled chip's same-code timings drift +-10-20% across minutes
# and a contended host can halve a reading (CLAUDE.md noise-band note),
# so the one canonical artifact used to show rows 35% under the
# quiet-window claims with no way to tell which regime captured them.
# Fix: a fixed CONTROL program (the lasso-fat headline config) runs
# immediately after every row's timed pass and its reading is stamped
# on the row; post-run, each row gets contention_idx = control / best
# control of the whole run — 1.0 means "captured in this run's best
# window", 0.7 means the window was ~30% depressed.
_CONTROL = {"fn": None}


def _set_control(fn):
    _CONTROL["fn"] = fn


# ---- per-solve dispatch floor (round-5 discovery) --------------------------
# Solve wall time on the tunneled chip is t(N) = a*N + b with b ~ 22-25 ms
# FIXED per dispatched program (measured: consensus W8 b=24.6 ms, a=7.6 us;
# a bare fori_loop of the same body b=22.4 ms, a=4.6 us — the N-sweep in
# docs/RESULTS.md round 5).  b is a TUNNEL property (program launch +
# completion detection round trips), not engine overhead — so iter/s
# readings at different maxiters are NOT comparable, and solve-level
# rates understate the device's marginal throughput by b/t.  The matrix
# measures b once (trivial-program dispatch, a slight underestimate of a
# while_loop's completion cost — conservative) and stamps every row with
# marginal_iter_s = steps / (t - b).
_DISPATCH = {"floor_s": None}


def _measure_dispatch_floor():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))  # compile + sync
    best = np.inf
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    _DISPATCH["floor_s"] = best
    print(json.dumps({"dispatch_floor_ms": round(best * 1e3, 3)}), flush=True)
    return best


def _run_twice(solve):
    """Warm-up (compile) + best-of-3 timed runs; returns the fastest
    timed results object.  Solver runtimes are loop-only (engine
    flushes setup first).  Best-of-3 (the headline bench's protocol):
    per-solve wall jitter on the tunnel is +-2-4 ms, which is material
    against the ~24 ms dispatch floor — a single pass made short rows'
    marginal rates swing +-40%.

    The warm-up's steps are materialized TO HOST: on the remote-compile
    relay, block_until_ready can return while the first compile is
    still in flight, and anything timed before the device is truly
    drained measures dispatch latency, not execution (observed: a
    'warm' batched run reading 0.3 ms for a 90 ms program).  A host
    transfer is a hard sync."""
    np.asarray(solve().steps)
    return min((solve() for _ in range(3)), key=lambda r: r.runtime)


# VMEM budget for the resident-reuse test (v5e: 128 MB; leave headroom
# for the vector state and compiler scratch).
_VMEM_BUDGET = 100 * 2**20


# ---- bare-loop device floor (VERDICT r4 weak #5) ---------------------------
# lp_engine_vs_handloop proved the LP row runs within 12% of a bare
# hand-written loop of the same body — i.e. its 16% "of roofline" is the
# DEVICE floor (loop turnaround + kernel issue), not money left on the
# table.  This generalizes that probe: for any GEMV-stream body, time a
# bare lax.while_loop of the chained matvecs + one reduction-normalized
# elementwise tail (mimicking the engine's residual norms) at the same
# unroll depth, and stamp the row with its % of that floor.


@functools.lru_cache(maxsize=None)
def _bare_loop_ips(chain, iters, unroll):
    """Measured bare-loop iter/s for a chained matvec body.

    ``chain``: tuple of (p, q) dense matvec stages (output dim p feeds
    the next stage; the last must produce the first's q) or (W, p, q)
    batched-einsum stages (the consensus/exchange stacked form — adds a
    mean-over-W + broadcast to mimic the collective).  The tail carries
    the engine's REAL per-iteration bookkeeping — four residual-norm
    reductions (pnorm/dnorm/perr/derr), four history-slot writes, and
    the step counter — so the floor is what a hand loop with the same
    observability would cost, not a stripped loop the engine could
    never match (the lp_engine_vs_handloop convention).  Returns
    iter/s (best of 3 timed passes after a warm-up with host sync).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(7)
    mats = []
    for s in chain:
        M = rng.standard_normal(s).astype(np.float32) / np.sqrt(s[-1])
        mats.append(jnp.asarray(M))
    first = chain[0]
    x0 = jnp.ones((first[0], first[-1]) if len(first) == 3 else (first[-1],),
                  jnp.float32)
    stacked = any(len(s) == 3 for s in chain)
    K = max(int(unroll), 1)
    n_steps = max(iters // K, 1)
    N = n_steps * K

    def sub(c):
        x, xprev, k, hist = c
        for M, s in zip(mats, chain):
            if len(s) == 3:
                x = jnp.einsum("wij,wj->wi", M, x)
            else:
                x = M @ x
        if stacked:
            x = x - jnp.mean(x, axis=0, keepdims=True) + 0.01
        # Boyd-residual-shaped reductions (engine norms block).
        pnorm = jnp.sqrt(jnp.sum(x * x))
        dnorm = jnp.sqrt(jnp.sum((x - xprev) ** 2))
        perr = 1e-5 + 1e-3 * jnp.maximum(pnorm, jnp.max(jnp.abs(x)))
        derr = 1e-5 + 1e-3 * jnp.sum(jnp.abs(x))
        hist = {
            "pnorm": lax.dynamic_update_index_in_dim(hist["pnorm"], pnorm,
                                                     k, 0),
            "dnorm": lax.dynamic_update_index_in_dim(hist["dnorm"], dnorm,
                                                     k, 0),
            "perr": lax.dynamic_update_index_in_dim(hist["perr"], perr,
                                                    k, 0),
            "derr": lax.dynamic_update_index_in_dim(hist["derr"], derr,
                                                    k, 0),
        }
        xn = x * lax.rsqrt(jnp.mean(x * x) + 1.0)
        return (xn, x, k + 1, hist)

    def body(i, c):
        for _ in range(K):
            c = sub(c)
        return c

    hist0 = {k: jnp.zeros((N,), jnp.float32)
             for k in ("pnorm", "dnorm", "perr", "derr")}

    def make(ns):
        def go(x):
            c = (x, x, jnp.asarray(0, jnp.int32), hist0)
            return lax.fori_loop(0, ns, body, c)[0]

        return jax.jit(go)

    # Two-point measurement -> MARGINAL iter/s (the per-solve dispatch
    # floor b cancels in the difference; see _measure_dispatch_floor).
    times = {}
    for ns in (n_steps, max(n_steps // 4, 1)):
        run = make(ns)
        np.asarray(run(x0))  # compile + hard host sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(x0))
            best = min(best, time.perf_counter() - t0)
        times[ns] = best
    lo = max(n_steps // 4, 1)
    if n_steps == lo:
        return (n_steps * K) / times[n_steps]
    return ((n_steps - lo) * K) / (times[n_steps] - times[lo])


def _row(name, shape, iters, res, bytes_per_iter=None, extra=None,
         unrolled=True, floor_chain=None, floor_unroll=16):
    # Bill throughput to the iterations that actually ran: a timing row
    # that NaN-exits early (nanguard) must not report an inflated rate.
    # Path rows carry per-lane step vectors; the batch runs until the
    # slowest lane, so its max is the wall-clock-determining count.
    steps_arr = np.asarray(res.steps)
    steps = int(steps_arr.max()) if steps_arr.ndim else int(steps_arr)
    finite = bool(np.all(np.isfinite(np.asarray(res.xopt))))
    ips = max(steps, 1) / res.runtime
    out = {
        "solver": name,
        "shape": shape,
        "iters": iters,
        "iters_per_sec": round(ips, 1),
        "ms_per_iter": round(1e3 / ips, 4),
        # Raw wall of the fastest pass: the reader's check on how much
        # of the row is dispatch floor (marginal_iter_s denominator).
        "wall_ms": round(res.runtime * 1e3, 2),
    }
    if steps != iters or not finite:
        out["valid"] = False
        out["steps_ran"] = steps
        out["finite"] = finite
    if _DISPATCH["floor_s"] is not None:
        # Marginal per-iteration rate with the measured per-solve
        # dispatch floor subtracted (the cross-N-comparable number; raw
        # iters_per_sec keeps round-to-round comparability).
        t_marg = res.runtime - _DISPATCH["floor_s"]
        if t_marg > 0.2 * res.runtime:
            out["marginal_iter_s"] = round(max(steps, 1) / t_marg, 1)
    if bytes_per_iter:
        roof_ms = bytes_per_iter / (_HBM_GBPS * 1e9) * 1e3
        out["roofline_ms_per_iter"] = round(roof_ms, 4)
        if unrolled and bytes_per_iter <= _VMEM_BUDGET:
            # Unrolled body with VMEM-resident operands: XLA hoists the
            # stream matrices across sub-iterations, so per-iteration HBM
            # traffic amortizes by ~K and the naive two-stream byte model
            # is NOT a valid efficiency denominator (rows were reading
            # 105-123% "of roofline" — VERDICT r2 weak #2).  The floor in
            # this regime is the kernel-issue rate (docs/RESULTS.md
            # round-3 floor probes), so the % is dropped rather than
            # faked.
            out["roofline_note"] = "vmem-resident under unroll; % n/a"
        else:
            out["pct_of_roofline"] = round(100.0 * roof_ms * ips / 1e3, 1)
    if floor_chain is not None and "marginal_iter_s" in out:
        # Bare-loop twin at the same unroll: the device floor for this
        # body class (sub-roofline rows get a floor_class instead of an
        # unexplained % — VERDICT r4 weak #5).  Both sides MARGINAL
        # (dispatch floor cancelled), so the comparison is N-independent.
        # Skipped when the row's wall is dispatch-dominated (no reliable
        # marginal) — raise the row's iters instead of faking a %.
        bare = _bare_loop_ips(tuple(tuple(s) for s in floor_chain),
                              4000, floor_unroll)
        out["bare_floor_marginal_iter_s"] = round(bare, 1)
        out["pct_of_bare_loop"] = round(
            100.0 * out["marginal_iter_s"] / bare, 1)
        pct_roof = out.get("pct_of_roofline")
        if pct_roof is not None and pct_roof >= 50.0:
            out["floor_class"] = "hbm-bound"
        elif out["pct_of_bare_loop"] >= 70.0:
            # The twin's tail carries the engine's bookkeeping but its
            # chain is leaner than a real prox body (no rhs build, no
            # threshold algebra): >= 70% of it is the device floor.
            out["floor_class"] = "device-floor"  # turnaround/issue-bound
        else:
            out["floor_class"] = "gap"
    if extra:
        out.update(extra)
    if _CONTROL["fn"] is not None:
        # Concurrent-contention stamp: the fixed control program's
        # reading in THIS row's time window (contention_idx added
        # post-run against the run's best control reading).
        out["control_iter_s"] = round(_CONTROL["fn"](), 1)
    # Progress line per row (flushed: TPU compiles take minutes, so a
    # silent multi-row run is indistinguishable from a hang).
    print(json.dumps(out), flush=True)
    return out


def timing_matrix(smoke=False):
    import jax.numpy as jnp

    from admm_tpu import ADMMConfig
    from admm_tpu.models.basispursuit import basispursuit
    from admm_tpu.models.covarianceselection import covarianceselection
    from admm_tpu.models.huberfit import huberfit
    from admm_tpu.models.lad import lad
    from admm_tpu.models.lasso import lasso
    from admm_tpu.models.linearprogram import linearprogram
    from admm_tpu.models.linearsvm import linearsvm
    from admm_tpu.models.model import model
    from admm_tpu.models.quadraticprogram import quadraticprogram
    from admm_tpu.models.totalvariation import totalvariation
    from admm_tpu.parallel import consensus_lasso, linearsvm_sharded

    rng = np.random.default_rng(0)
    f32 = np.float32
    sc = 4 if smoke else 1  # smoke: shrink shapes 4x, iters 10x
    it = lambda n: max(n // (10 if smoke else 1), 10)
    rows = []

    def cfg(iters, unroll="auto", **kw):
        # unroll='auto' lets each wrapper resolve its measured body class
        # (config.resolve_unroll: GEMV bodies 16, heavy bodies 1); the
        # lasso_fat_f32_unroll1 row keeps the unrolled-off delta visible.
        return ADMMConfig(maxiters=iters, domaxiters=True, unroll=unroll,
                          **kw)

    _measure_dispatch_floor()

    # ---- contention control: the lasso-fat headline config, compiled
    # once, run right after every row's timed pass (see _set_control).
    mc, nc = 1500 // sc, 5000 // sc
    Dctl = rng.standard_normal((mc, nc)).astype(f32)
    Dctl /= np.sqrt(np.sum(Dctl**2, axis=0, keepdims=True))
    sctl = (Dctl @ (rng.standard_normal(nc)
                    * (rng.random(nc) < 0.1))).astype(f32)
    lamctl = float(0.1 * np.max(np.abs(Dctl.T @ sctl)))
    citers = it(2000)
    ctl_cfg = cfg(citers)

    def _control():
        return citers / lasso(Dctl, sctl, lamctl, ctl_cfg).runtime

    np.asarray(lasso(Dctl, sctl, lamctl, ctl_cfg).steps)  # compile + sync
    _set_control(_control)

    # --- model: two dense n-by-n inverse applies per iteration ----------
    n = 2048 // sc
    P, Q = rng.standard_normal((n, n)).astype(f32), rng.standard_normal((n, n)).astype(f32)
    r, s = rng.standard_normal(n).astype(f32), rng.standard_normal(n).astype(f32)
    iters = it(8000)  # wall >> the ~25 ms dispatch floor (round 5)
    res = _run_twice(lambda: model(P, Q, r, s, cfg(iters)))
    rows.append(_row("model", f"{n}x{n}", iters, res,
                     bytes_per_iter=2 * n * n * 4,
                     floor_chain=[(n, n), (n, n)]))

    # --- lasso fat (headline): f32 / fused Pallas / bf16 streams --------
    m, n = 1500 // sc, 5000 // sc
    testx = rng.standard_normal(n) * (rng.random(n) < 0.1)
    D = rng.standard_normal((m, n)).astype(f32)
    D /= np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    sv = (D @ testx + 0.03 * rng.standard_normal(m)).astype(f32)
    lam = float(0.1 * np.max(np.abs(D.T @ sv)))
    iters = it(2000)
    streams = 2 * m * n  # FatShiftSolver: two m-by-n matvec streams
    res = _run_twice(lambda: lasso(D, sv, lam, cfg(iters, unroll=1)))
    rows.append(_row("lasso_fat_f32_unroll1", f"{m}x{n}", iters, res,
                     bytes_per_iter=streams * 4, unrolled=False))
    res = _run_twice(lambda: lasso(D, sv, lam, cfg(iters)))
    rows.append(_row("lasso_fat_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=streams * 4))
    res = _run_twice(lambda: lasso(D, sv, lam, cfg(iters), use_fused_kernel=True))
    rows.append(_row("lasso_fat_f32_fusedkernel", f"{m}x{n}", iters, res,
                     bytes_per_iter=streams * 4))
    res = _run_twice(lambda: lasso(D, sv, lam, cfg(iters), stream_dtype=jnp.bfloat16))
    rows.append(_row("lasso_fat_bf16streams", f"{m}x{n}", iters, res,
                     bytes_per_iter=streams * 2))
    res = _run_twice(lambda: lasso(D, sv, lam, cfg(iters),
                                   stream_dtype=jnp.bfloat16,
                                   use_fused_kernel=True))
    rows.append(_row("lasso_fat_bf16_fusedkernel", f"{m}x{n}", iters, res,
                     bytes_per_iter=streams * 2))

    # --- lasso skinny: one n-by-n inverse apply -------------------------
    m, n = 4096 // sc, 1024 // sc
    D2 = rng.standard_normal((m, n)).astype(f32)
    s2 = rng.standard_normal(m).astype(f32)
    iters = it(8000)  # dispatch-floor headroom
    res = _run_twice(lambda: lasso(D2, s2, 0.1, cfg(iters)))
    rows.append(_row("lasso_skinny_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=n * n * 4, floor_chain=[(n, n)]))

    # --- basis pursuit: projection P (n x n) apply ----------------------
    m, n = 512 // sc, 2048 // sc
    D3 = rng.standard_normal((m, n)).astype(f32)
    x3 = rng.standard_normal(n) * (rng.random(n) < 0.1)
    s3 = (D3 @ x3).astype(f32)
    iters = it(8000)  # dispatch-floor headroom
    res = _run_twice(lambda: basispursuit(D3, s3, cfg(iters)))
    rows.append(_row("basispursuit_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=n * n * 4, floor_chain=[(n, n)]))

    # --- total variation: dense vs cyclic-reduction crossover -----------
    for n, solver, iters in (
        (2048 // sc, "dense", it(8000)),
        # dense 16384 OOM-kills the remote compile helper (the 1 GB
        # inverse blows the compiler's constant budget); the dense/cr
        # crossover shows at 8192 already.
        (8192 // sc, "dense", it(500)),
        (8192 // sc, "cr", it(2000)),
        ((65536, "cr", it(1000)) if not smoke else (16384, "cr", it(1000))),
    ):
        stair = np.repeat(rng.standard_normal(max(n // 64, 1)), 64)[:n]
        sig = (stair + 0.5 * rng.standard_normal(n)).astype(f32)
        res = _run_twice(
            lambda sig=sig, solver=solver, iters=iters:
            totalvariation(sig, 0.5, cfg(iters), solver=solver))
        bpi = n * n * 4 if solver == "dense" else None
        rows.append(_row(f"totalvariation_{solver}", f"n={n}", iters, res,
                         bytes_per_iter=bpi))

    # --- lad / huberfit: cached normal-equations solve ------------------
    m, n = 4096 // sc, 512 // sc
    D4 = rng.standard_normal((m, n)).astype(f32)
    s4 = rng.standard_normal(m).astype(f32)
    iters = it(8000)  # dispatch-floor headroom
    res = _run_twice(lambda: lad(D4, s4, cfg(iters)))
    rows.append(_row("lad_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=(n * n + 2 * m * n) * 4,
                     floor_chain=[(n, m), (m, n)]))
    res = _run_twice(lambda: huberfit(D4, s4, cfg(iters)))
    rows.append(_row("huberfit_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=(n * n + 2 * m * n) * 4,
                     floor_chain=[(n, m), (m, n)]))

    # --- LP / QP: folded static-KKT paths -------------------------------
    n = 1024 // sc
    truex = np.abs(rng.standard_normal(n))
    Dlp = np.abs(rng.standard_normal((n, n))).astype(f32)
    slp = (Dlp @ truex).astype(f32)
    blp = (rng.random(n) + 0.5).astype(f32)
    iters = it(16000)  # tiny affine body: dispatch-floor headroom
    # kkt_mode='affine' (the default) folds the whole KKT solve into one
    # n-by-n GEMV — no in-loop triangular pair, so LP/QP-standard now
    # unroll like every other GEMV body (they previously required
    # unroll=1; the chol row keeps that old profile visible).
    res = _run_twice(lambda: linearprogram(blp, Dlp, slp, cfg(iters)))
    rows.append(_row("linearprogram_f32", f"n={n}", iters, res,
                     bytes_per_iter=n * n * 4,  # one K1 stream
                     floor_chain=[(n, n)]))
    res = _run_twice(lambda: linearprogram(blp, Dlp, slp, cfg(iters, unroll=1),
                                           kkt_mode="chol"))
    rows.append(_row("linearprogram_chol_f32", f"n={n}", iters, res,
                     bytes_per_iter=3 * n * n * 4,  # Minv, MinvDt, tri pair
                     unrolled=False))

    # QP-standard uses its own well-conditioned constraint block: the
    # LP's reference-style all-positive D makes kappa(D Minv D^T) ~
    # kappa(D)^2 * kappa(P) and the f32 setup Cholesky NaNs (caught by
    # the nanguard, but a diverged run is not a timing measurement).
    Pq = rng.standard_normal((n, n)).astype(f32)
    Pq = (Pq @ Pq.T + n * np.eye(n)).astype(f32)
    qv = rng.standard_normal(n).astype(f32)
    Dqp = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(f32)
    sqp = (Dqp @ truex).astype(f32)
    res = _run_twice(
        lambda: quadraticprogram(Pq, qv, 0.0, Dqp, sqp, cfg(iters)))
    rows.append(_row("quadraticprogram_standard_f32", f"n={n}", iters, res,
                     bytes_per_iter=n * n * 4, floor_chain=[(n, n)]))

    n2 = 2048 // sc
    Pb = rng.standard_normal((n2, n2)).astype(f32)
    Pb = (Pb @ Pb.T + n2 * np.eye(n2)).astype(f32)
    qb = rng.standard_normal(n2).astype(f32)
    lb, ub = -np.ones(n2, f32), np.ones(n2, f32)
    iters2 = it(8000)
    res = _run_twice(
        lambda: quadraticprogram(Pb, qb, 0.0, lb, ub, cfg(iters2)))
    rows.append(_row("quadraticprogram_bounded_f32", f"n={n2}", iters2, res,
                     bytes_per_iter=n2 * n2 * 4))

    # --- covariance selection: eigh INSIDE the loop vs Newton-Schulz ----
    # prox_method='ns' evaluates the same spectral prox as matmul-only
    # Newton-Schulz square-root work (ops/matfun.py) — measured 2.5-4.5x
    # the eigh path on v5e (5.9x at the tuned ns_iters=14), final
    # solutions matching to ~2e-7.
    n = 256 // sc
    A = rng.standard_normal((4 * n, n)).astype(f32)
    iters = it(200)
    res = _run_twice(lambda: covarianceselection(A, 0.1, cfg(iters)))
    rows.append(_row("covarianceselection_f32", f"n={n}", iters, res))
    res = _run_twice(
        lambda: covarianceselection(A, 0.1, cfg(iters), prox_method="ns"))
    rows.append(_row("covarianceselection_ns_f32", f"n={n}", iters, res))
    n = 512 // sc
    A = rng.standard_normal((4 * n, n)).astype(f32)
    res = _run_twice(
        lambda: covarianceselection(A, 0.1, cfg(iters), prox_method="ns"))
    rows.append(_row("covarianceselection_ns_f32", f"n={n}", iters, res))
    # ns_fast: bf16-pass square-root steps + 2 full-precision residual
    # corrections — same final accuracy as 'ns' (rel-F ~1.6e-7 vs eigh),
    # measured 1.9-2.6x 'ns' / 10.8-11.8x eigh (round-4 probe).  The
    # n=1024 rows close the VERDICT r3 heavy-tail gap (no n>=1024 row).
    res = _run_twice(
        lambda: covarianceselection(A, 0.1, cfg(iters),
                                    prox_method="ns_fast", ns_iters=14))
    rows.append(_row("covarianceselection_nsfast_f32", f"n={n}", iters, res))
    if not smoke:
        n = 1024
        A = rng.standard_normal((4 * n, n)).astype(f32)
        iters = it(100)
        res = _run_twice(
            lambda: covarianceselection(A, 0.1, cfg(iters),
                                        prox_method="ns", ns_iters=14))
        rows.append(_row("covarianceselection_ns_f32", f"n={n}", iters, res))
        res = _run_twice(
            lambda: covarianceselection(A, 0.1, cfg(iters),
                                        prox_method="ns_fast", ns_iters=14))
        rows.append(_row("covarianceselection_nsfast_f32", f"n={n}", iters,
                         res))

    # --- quantile regression: LAD's body with the asymmetric threshold --
    from admm_tpu.models.quantile import quantile

    m, n = 4096 // sc, 512 // sc
    Dq5 = rng.standard_normal((m, n)).astype(f32)
    s5 = rng.standard_normal(m).astype(f32)
    iters = it(8000)
    res = _run_twice(lambda: quantile(Dq5, s5, 0.8, cfg(iters)))
    rows.append(_row("quantile_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=(n * n + 2 * m * n) * 4,
                     floor_chain=[(n, m), (m, n)]))

    # --- robust PCA: one batched svd per iteration ('heavy' body) -------
    from admm_tpu.models.rpca import rpca

    nr = 256 // sc
    Lr = (rng.standard_normal((nr, 8)) @ rng.standard_normal((8, nr))).astype(f32)
    Sr = ((rng.random((nr, nr)) < 0.05) * 5 * rng.standard_normal((nr, nr))).astype(f32)
    iters = it(200)
    res = _run_twice(lambda: rpca(Lr + Sr, config=cfg(iters)))
    rows.append(_row("rpca_f32", f"{nr}x{nr}", iters, res))
    res = _run_twice(lambda: rpca(Lr + Sr, config=cfg(iters),
                                  prox_method="rsvd", rank=16))
    rows.append(_row("rpca_rsvd16_f32", f"{nr}x{nr}", iters, res))

    # --- sparse logistic regression: damped-Newton prox in the loop -----
    from admm_tpu.models.logreg import logreg
    from admm_tpu.models.batch import logreg_batch

    m, n = 4096 // sc, 256 // sc
    Dlr = rng.standard_normal((m, n)).astype(f32)
    wlr = rng.standard_normal(n)
    plr = 1.0 / (1.0 + np.exp(-(Dlr @ wlr)))
    ylr = np.where(rng.random(m) < plr, 1.0, -1.0).astype(f32)
    iters = it(200)
    res = _run_twice(lambda: logreg(Dlr, ylr, 0.1, cfg(iters)))
    rows.append(_row("logreg_f32", f"{m}x{n}", iters, res))
    # One-vs-all multiclass lanes sharing D (the logistic svm_batch).
    y8 = rng.integers(0, 8, size=m)
    ell8 = np.stack([np.where(y8 == k, 1.0, -1.0)
                     for k in range(8)]).astype(f32)
    # Default = matrix-free Newton-CG (round 5): the CG matvecs batch
    # into (B, m) x (m, n) GEMMs — at the tuned default (4 Newton x 12
    # PCG) measured ~14x serial inst-iters/s vs the dense path's 1.2x
    # (experiments/logreg_cg_probe.py + the knob sweep: 3x12..5x20 all
    # give identical trajectories; the dense (B, n, n) factorizations
    # serialize on TPU).
    res = _run_twice(lambda: logreg_batch(Dlr, ell8, 0.1, cfg(iters)))
    rows.append(_row("logreg_batch_B8_cg", f"{m}x{n}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(8 * iters / res.runtime, 1)}))
    res = _run_twice(lambda: logreg_batch(Dlr, ell8, 0.1, cfg(iters),
                                          inner="newton"))
    rows.append(_row("logreg_batch_B8_dense", f"{m}x{n}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(8 * iters / res.runtime, 1)}))

    # --- linear SVM: serial + 8-shard transpose reduction on-chip -------
    m, n = 4096 // sc, 512 // sc
    Dsvm = rng.standard_normal((m, n)).astype(f32)
    w0 = rng.standard_normal(n)
    ell = np.sign(Dsvm @ w0 + 0.1 * rng.standard_normal(m)).astype(f32)
    iters = it(8000)  # dispatch-floor headroom (consensus series shares)
    res = _run_twice(lambda: linearsvm(Dsvm, ell, 1.0, cfg(iters)))
    rows.append(_row("linearsvm_serial_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=2 * m * n * 4,
                     floor_chain=[(n, m), (m, n)]))
    res = _run_twice(
        lambda: linearsvm_sharded(Dsvm, ell, 1.0, cfg(iters), nshards=8))
    rows.append(_row("linearsvm_sharded8_f32", f"{m}x{n}", iters, res,
                     bytes_per_iter=2 * m * n * 4))

    # One-vs-all multiclass: 10 classifiers differing only in labels,
    # trained in one vmapped program (mnistsvm's per-digit loop).
    from admm_tpu.models.batch import svm_batch

    y10 = rng.integers(0, 10, size=m)
    ells = np.stack([np.where(y10 == k, 1.0, -1.0)
                     for k in range(10)]).astype(f32)
    res = _run_twice(lambda: svm_batch(Dsvm, ells, 1.0, cfg(iters)))
    rows.append(_row("svm_batch_B10_onevsall", f"{m}x{n}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(10 * iters / res.runtime, 1)}))

    # The same 10 classifiers through the 2-D composed transpose-
    # reduction program (lanes x 8 row shards stacked on this chip).
    from admm_tpu.parallel import svm_batch_sharded
    from admm_tpu.parallel.mesh import make_mesh2d

    res = _run_twice(
        lambda: svm_batch_sharded(Dsvm, ells, 1.0, cfg(iters),
                                  mesh=make_mesh2d(1, 1), nshards=8))
    rows.append(_row("svm_batch_sharded_B10x8shard", f"{m}x{n}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(10 * iters / res.runtime, 1)}))

    # --- consensus lasso: shard-count series on this chip ----------------
    # Fixed total rows, W in {1, 2, 4, 8}: separates the consensus math /
    # collective cost from the stacked-solve bytes (VERDICT r3 weak #5).
    # Round-4 probes (experiments/consensus_shard_probe.py + _gap_bisect,
    # interleaved, honest host-sync timing): the series declines gently
    # with the stacked Minv bytes (54.5k -> 41.5k iter/s, W=1 -> 8 at
    # unroll 4) and at the auto-resolved unroll 16 the runner MATCHES the
    # bare hand-loop floor (49-50k vs 49.0k).  Round 3's 8.8k row was a
    # timing artifact — the consensus clock used to stop after from_raw's
    # per-scalar host round trips (fixed in consensus_admm).
    for Wsh in (1, 2, 4, 8):
        res = _run_twice(
            lambda Wsh=Wsh: consensus_lasso(Dsvm, s4, 0.1, cfg(iters),
                                            nshards=Wsh))
        rows.append(_row(f"consensus_lasso_{Wsh}shard_f32", f"{m}x{n}",
                         iters, res, bytes_per_iter=Wsh * n * n * 4,
                         floor_chain=[(Wsh, n, n)]))

    # 2-D composition on one chip: B=8 instance lanes x 8 row shards in
    # one program (consensus_lasso_batch over make_mesh2d(1,1) — lanes
    # and shards both stacked on the single device; on a pod they spread
    # over the two mesh axes).
    from admm_tpu.parallel import consensus_lasso_batch, make_mesh2d

    S8 = np.stack([s4 + 0.01 * k for k in range(8)]).astype(f32)
    res = _run_twice(
        lambda: consensus_lasso_batch(Dsvm, S8, 0.1, cfg(iters),
                                      mesh=make_mesh2d(1, 1), nshards=8))
    rows.append(_row("consensus_lasso_batch_B8x8shard", f"{m}x{n}", iters,
                     res, extra={"inst_iters_per_sec":
                                 round(8 * iters / res.runtime, 1)}))

    # Accelerated consensus: the momentum/restart state adds elementwise
    # work + one extra scalar all-reduce (the d-value) per iteration.
    # dvaltol=0 disables the alg-2 d-stop (which ignores domaxiters by
    # design) so the row measures exactly `iters` iterations.
    res = _run_twice(
        lambda: consensus_lasso(Dsvm, s4, 0.1,
                                cfg(iters, fast=True, dvaltol=0.0),
                                nshards=8))
    rows.append(_row("consensus_lasso_8shard_fast_f32", f"{m}x{n}", iters,
                     res, bytes_per_iter=8 * n * n * 4))

    # --- batched regularization path: one vmapped program, B lambdas ----
    from admm_tpu.models.paths import lasso_path

    m, n, B = 1500 // sc, 5000 // sc, 128
    Dp = rng.standard_normal((m, n)).astype(f32)
    Dp /= np.sqrt(np.sum(Dp**2, axis=0, keepdims=True))
    sp = (Dp @ (rng.standard_normal(n) * (rng.random(n) < 0.1))).astype(f32)
    lmax = float(np.max(np.abs(Dp.T @ sp)))
    lams = np.geomspace(0.001 * lmax, 0.5 * lmax, B).astype(f32)
    iters = it(300)
    for tag, kw in (("highest", {}),
                    ("bf16pass", {"matmul_precision": "default"})):
        res = _run_twice(lambda kw=kw: lasso_path(Dp, sp, lams, cfg(iters), **kw))
        rows.append(_row(f"lasso_path_B{B}_{tag}", f"{m}x{n}", iters, res,
                         extra={"inst_iters_per_sec":
                                round(B * iters / res.runtime, 1)}))

    # --- instance batching: B distinct signals, one shared dictionary ---
    from admm_tpu.models.batch import lasso_batch, tv_batch

    Xb = (rng.standard_normal((B, n)) * (rng.random((B, n)) < 0.1)).astype(f32)
    Sb = (Xb @ Dp.T + 0.03 * rng.standard_normal((B, m))).astype(f32)
    lamb = float(0.1 * np.median(np.max(np.abs(Sb @ Dp), axis=1)))
    res = _run_twice(lambda: lasso_batch(Dp, Sb, lamb, cfg(iters)))
    rows.append(_row(f"lasso_batch_B{B}", f"{m}x{n}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(B * iters / res.runtime, 1)}))

    # B signals through the shared cyclic-reduction TV elimination.
    ntv = 8192 // sc
    Sig = np.cumsum(rng.standard_normal((B, ntv)), axis=1).astype(f32)
    res = _run_twice(lambda: tv_batch(Sig, 1.0, cfg(iters), solver="cr"))
    rows.append(_row(f"tv_batch_B{B}_cr", f"n={ntv}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(B * iters / res.runtime, 1)}))

    # B compressed-sensing decodes against one shared sensing matrix:
    # the projection P is shared, each lane is a dense (n, n) GEMV so
    # the batch is one (B, n) x (n, n) GEMM per iteration.
    from admm_tpu.models.batch import basispursuit_batch

    mbp, nbp = 512 // sc, 2048 // sc
    Dbp = rng.standard_normal((mbp, nbp)).astype(f32)
    Xbp = (rng.standard_normal((B, nbp)) * (rng.random((B, nbp)) < 0.05))
    Sbp = (Xbp @ Dbp.T).astype(f32)
    res = _run_twice(lambda: basispursuit_batch(Dbp, Sbp, cfg(iters)))
    rows.append(_row(f"basispursuit_batch_B{B}", f"{mbp}x{nbp}", iters, res,
                     extra={"inst_iters_per_sec":
                            round(B * iters / res.runtime, 1)}))

    # B QPs sharing one Hessian + equality structure with fresh linear
    # terms (the MPC pattern): one KKT fold at setup, per-iteration
    # work one (B, n) x (n, n) GEMM.  lp_batch runs the identical loop
    # body (P = 0), so this row covers both.
    from admm_tpu.models.batch import qp_batch

    nq, mq, Bq = 1024 // sc, 256 // sc, 64
    Rq = rng.standard_normal((nq, 2 * nq)).astype(f32)
    Pq = (Rq @ Rq.T / (2 * nq) + 0.1 * np.eye(nq)).astype(f32)
    Dq = rng.standard_normal((mq, nq)).astype(f32)
    Ssq = (np.abs(rng.standard_normal((Bq, nq))) @ Dq.T).astype(f32)
    Qsq = rng.standard_normal((Bq, nq)).astype(f32)
    itq = it(1000)
    res = _run_twice(lambda: qp_batch(Pq, Qsq, 0.0, Dq, Ssq, cfg(itq)))
    rows.append(_row(f"qp_batch_B{Bq}_standard", f"n={nq}", itq, res,
                     extra={"inst_iters_per_sec":
                            round(Bq * itq / res.runtime, 1)}))

    # Graphical lasso over a cohort of B covariance matrices via the
    # Newton-Schulz x-prox: the batched iteration is pure (B, n, n)
    # GEMM work on the MXU, no eigh inside the loop.
    from admm_tpu.models.batch import covsel_batch

    Bc, nc = 32, max(2, 128 // sc)
    Zc = rng.standard_normal((Bc, nc, 4 * nc)).astype(f32)
    Sc = (Zc @ np.swapaxes(Zc, 1, 2) / (4 * nc)
          + 0.1 * np.eye(nc, dtype=f32)).astype(f32)
    itc = it(200)
    res = _run_twice(lambda: covsel_batch(Sc, 0.05, cfg(itc)))
    rows.append(_row(f"covsel_batch_B{Bc}_ns", f"n={nc}", itc, res,
                     extra={"inst_iters_per_sec":
                            round(Bc * itc / res.runtime, 1)}))
    res = _run_twice(lambda: covsel_batch(Sc, 0.05, cfg(itc),
                                          prox_method="ns_fast",
                                          ns_iters=14))
    rows.append(_row(f"covsel_batch_B{Bc}_nsfast", f"n={nc}", itc, res,
                     extra={"inst_iters_per_sec":
                            round(Bc * itc / res.runtime, 1)}))

    # Batched max-cut-style SDP relaxations (diag constraint): the eigh
    # z-prox (batched eigh serializes on TPU) vs the Newton-Schulz
    # matmul-only projection — the covsel story on the PSD cone.
    from admm_tpu.models.batch import sdp_batch

    Bs, nsd = 16, max(2, 128 // sc)
    Wadj = (rng.random((Bs, nsd, nsd)) < 0.1).astype(f32)
    Wadj = np.triu(Wadj, 1)
    Wadj = Wadj + np.swapaxes(Wadj, 1, 2)
    Lap = (np.stack([np.diag(Wadj[i].sum(-1)) for i in range(Bs)])
           - Wadj).astype(f32)
    its = it(100)  # in-loop batched eigh is expensive on TPU
    res = _run_twice(lambda: sdp_batch(-0.25 * Lap, "diag",
                                       np.ones(nsd, f32), cfg(its)))
    rows.append(_row(f"sdp_batch_B{Bs}_eigh", f"n={nsd}", its, res,
                     extra={"inst_iters_per_sec":
                            round(Bs * its / res.runtime, 1)}))
    # Full-precision NS only: the bf16-coarse + residual-correction
    # recipe that wins for covsel DIVERGES here — the correction needs
    # the coupled inverse root Z ~ S^{-1}, and the projection argument
    # W^2 is near-singular at the spectrum crossing (psd_project_ns
    # conditioning caveat; measured: nanguard fires at step 3).
    res = _run_twice(lambda: sdp_batch(-0.25 * Lap, "diag",
                                       np.ones(nsd, f32), cfg(its),
                                       prox_method="ns", ns_iters=16))
    rows.append(_row(f"sdp_batch_B{Bs}_ns", f"n={nsd}", its, res,
                     extra={"inst_iters_per_sec":
                            round(Bs * its / res.runtime, 1)}))

    # --- SDP NS-vs-eigh at scale (round 5, VERDICT r4 weak #6) ----------
    # n=256 batched and n=512 serial diag-constrained relaxations: does
    # the 19.1x NS advantage measured at n=128 hold as n grows?  (The
    # z-prox dominates both paths; plain full-precision NS — the
    # bf16-coarse recipe needs ns_delta > 0, see the delta-sweep probe.)
    from admm_tpu.models.sdp import sdp as _sdp_serial

    for Bs2, ns2, its2 in ((4, 256 // sc, it(60)), (1, 512 // sc, it(40))):
        Wadj2 = (rng.random((max(Bs2, 1), ns2, ns2)) < 0.1).astype(f32)
        Wadj2 = np.triu(Wadj2, 1)
        Wadj2 = Wadj2 + np.swapaxes(Wadj2, 1, 2)
        Lap2 = (np.stack([np.diag(Wadj2[i].sum(-1))
                          for i in range(max(Bs2, 1))]) - Wadj2).astype(f32)
        ones2 = np.ones(ns2, f32)
        for pm in ("eigh", "ns"):
            kw = {} if pm == "eigh" else {"ns_iters": 16}
            if Bs2 > 1:
                res = _run_twice(lambda pm=pm, kw=kw: sdp_batch(
                    -0.25 * Lap2, "diag", ones2, cfg(its2),
                    prox_method=pm, **kw))
                rows.append(_row(f"sdp_batch_B{Bs2}_{pm}", f"n={ns2}", its2,
                                 res, extra={"inst_iters_per_sec":
                                             round(Bs2 * its2 / res.runtime,
                                                   1)}))
            else:
                res = _run_twice(lambda pm=pm, kw=kw: _sdp_serial(
                    -0.25 * Lap2[0], "diag", ones2, config=cfg(its2),
                    prox_method=pm, **kw))
                rows.append(_row(f"sdp_serial_{pm}", f"n={ns2}", its2, res))

    # --- sharded SDP (round 5): the constraint stack over 8 shards ------
    # On one chip the shard axis stacks (the consensus-series treatment):
    # the row measures the GSPMD layout's overhead vs the serial program
    # at the same shape — the multi-chip win is A's HBM / W.
    from admm_tpu.models.sdp import random_sdp_instance
    from admm_tpu.parallel import sdp_sharded

    nsd3, msd3 = 128 // sc, 512 // sc
    Csd3, Asd3, bsd3, *_ = random_sdp_instance(nsd3, msd3, nsd3 // 4, rng,
                                               dtype=f32)
    its3 = it(100)
    res = _run_twice(lambda: _sdp_serial(Csd3, Asd3, bsd3, config=cfg(its3)))
    rows.append(_row("sdp_dense_serial", f"n={nsd3} m={msd3}", its3, res))
    res = _run_twice(lambda: sdp_sharded(Csd3, Asd3, bsd3, config=cfg(its3),
                                         nshards=8))
    rows.append(_row("sdp_dense_sharded8", f"n={nsd3} m={msd3}", its3, res))

    # --- consensus covariance selection (round 5): matrix-iterate tier --
    # Samples row-sharded 8 ways, per-shard spectral local proxes
    # (batched (8, p, p) work), global soft-threshold — eigh vs the
    # matmul-only NS local prox.
    from admm_tpu.parallel import consensus_covsel

    pcv, mcv = 256 // sc, 4096 // sc
    Dcv = rng.standard_normal((mcv, pcv)).astype(f32)
    itcv = it(200)
    res = _run_twice(lambda: consensus_covsel(Dcv, 0.1, cfg(itcv),
                                              nshards=8))
    rows.append(_row("consensus_covsel_8shard_eigh", f"p={pcv}", itcv, res))
    res = _run_twice(lambda: consensus_covsel(Dcv, 0.1, cfg(itcv),
                                              nshards=8, prox_method="ns",
                                              ns_iters=14))
    rows.append(_row("consensus_covsel_8shard_ns", f"p={pcv}", itcv, res))

    # Exchange ADMM on-chip: W=8 quadratic agents stacked on one device
    # (the collective degenerates to a batched mean — the same honest
    # single-chip treatment as the consensus shard series).
    from admm_tpu.parallel import exchange_quadratic

    Wx, mx, nx = 8, 512 // sc, 256 // sc
    Ax = rng.standard_normal((Wx, mx, nx)).astype(f32)
    bx = rng.standard_normal((Wx, mx)).astype(f32)
    itx = it(16000)  # tiny stacked body: dispatch-floor headroom
    res = _run_twice(lambda: exchange_quadratic(
        Ax, bx, cfg(itx)))
    rows.append(_row(f"exchange_W{Wx}", f"{mx}x{nx}", itx, res,
                     floor_chain=[(Wx, nx, nx), (Wx, nx, nx)]))

    _set_control(None)
    # Self-normalize every row against the run's best control window:
    # contention_idx 1.0 = captured at this run's best; 0.7 = the
    # concurrent control read 30% low (tunnel/host contention).
    controls = [r["control_iter_s"] for r in rows if "control_iter_s" in r]
    if controls:
        cmax = max(controls)
        for r in rows:
            if "control_iter_s" in r:
                r["contention_idx"] = round(r["control_iter_s"] / cmax, 3)

    return rows


# f32-appropriate oracle tolerances (the CPU/f64 suite bars are in
# tests/; covsel/TV/huber criteria are objective comparisons, binary).
_F32_ERRTOL = {
    "model": 2e-3,
    "lasso": 1e-3,
    "basispursuit": 1e-4,     # f64 bar 1e-10 is below the f32 floor
    "totalvariation": 0.02,
    "lad": 1e-2,
    "huberfit": 1e-3,
    "linearprogram": 1e-4,    # f64 bar 1e-10
    "quadraticprogram": 5e-3,  # x-residual criterion; ~2e-3 is the f32 floor
    "covarianceselection": 1e-3,
    # Reference bar (solvertester.m:114-123), reconciled: f32 adds no
    # measurable slope scatter over the construction's own sampling noise
    # (matrix row at seed 1 reads hinge 0.004 / 0-1 0.040; the 0-1 bar is
    # errtol01 = 2.5x this inside linearsvmtest).  The earlier 0.08 was a
    # conservative placeholder, not a measured f32 floor.
    "linearsvm": 0.05,
    # KKT subgradient residual of the nonsmooth optimum at f32.
    "logreg": 5e-3,
}


def accuracy_matrix(smoke=False):
    """Run each solver's randomized oracle ON DEVICE at f32 (VERDICT
    round-1 item: the CPU suite is f64-only).  Truth values come from the
    host-side f64 numpy constructions inside the testers."""
    from admm_tpu.testers import problems as p

    rows = []
    for name, tester, kw in (
        ("model", p.modeltest, {}),
        ("lasso", p.lassotest, {}),
        ("basispursuit", p.basispursuittest, {}),
        ("totalvariation", p.totalvariationtest, {}),
        ("lad", p.ladtest, {}),
        ("huberfit", p.huberfittest, {}),
        ("linearprogram", p.linearprogramtest, {}),
        ("quadraticprogram", p.quadraticprogramtest, {"form": "standard"}),
        ("quadraticprogram_bounded", p.quadraticprogramtest, {"form": "bounded"}),
        ("covarianceselection", p.covarianceselectiontest, {}),
        ("covarianceselection_ns", p.covarianceselectiontest,
         {"prox_method": "ns"}),
        # ns_fast = bf16-pass NS + full-precision residual corrections;
        # this row is the on-device accuracy evidence for the fast mode
        # (the bf16 passes only exist on TPU — CPU tests can't see them).
        ("covarianceselection_nsfast", p.covarianceselectiontest,
         {"prox_method": "ns_fast"}),
        ("linearsvm", p.linearsvmtest, {}),
        ("logreg", p.logregtest, {}),
        # The matrix-free Newton-CG x-prox (the batched default) —
        # on-device f32 evidence for the round-5 performance mode.
        ("logreg_cg", p.logregtest, {"inner": "newton_cg"}),
    ):
        errtol = _F32_ERRTOL.get(name.split("_")[0], 1e-3)
        t0 = time.perf_counter()
        # The testers default to f64-grade stopping (abstol 1e-11) which
        # sits below the f32 floor and burns the full iteration budget;
        # use f32-appropriate Boyd tolerances PLUS the plateau detector
        # (ADMMConfig.stallwindow) for families whose f32 residual floor
        # sits above even those — a stalled row stops at its floor
        # instead of measuring the iteration cap (VERDICT r3 weak #1).
        out = tester(seed=1, errtol=errtol, quiet=True,
                     abstol=1e-7, reltol=1e-6, stallwindow=100, **kw)
        dt = time.perf_counter() - t0
        test = out[-1]
        res = out[0]
        row = {"solver": name, "f32_errtol": errtol,
               "failed": bool(test["failed"]), "steps": int(res.steps),
               "stalled": bool(res.stalled), "wall_s": round(dt, 2)}
        for k in ("objerror", "xresidual", "relerror", "objopt",
                  "trueobjopt", "relerr_hinge", "relerr_01", "failreason"):
            if k in test and test[k] is not None and not isinstance(
                    test[k], np.ndarray):
                row[k] = (round(float(test[k]), 8)
                          if isinstance(test[k], (int, float, np.floating))
                          else test[k])
        print(json.dumps(row), flush=True)
        rows.append(row)

    rows.extend(_beyond_reference_accuracy())
    return rows


def _beyond_reference_accuracy():
    """On-device f32 oracles for the beyond-reference families (the CPU
    suite tests them at f64; this is the evidence the f32 device path is
    usable for them too).  Truths computed host-side in f64."""
    import jax.numpy as jnp

    from admm_tpu import (ADMMConfig, elasticnet, grouplasso, nnls,
                          quantile, rpca)

    rng = np.random.default_rng(1)
    f32 = np.float32
    # stallwindow: nnls/quantile floor above the f32 Boyd gate and would
    # otherwise burn all 20k iterations at constant quality.
    cfg = ADMMConfig(maxiters=20000, abstol=1e-7, reltol=1e-6,
                     stallwindow=100)
    rows = []

    def emit(name, errtol, err, res, extra=None):
        row = {"solver": name, "f32_errtol": errtol,
               "failed": bool(not (err <= errtol)),
               "relerror": round(float(err), 8), "steps": int(res.steps),
               "stalled": bool(res.stalled)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)
        rows.append(row)

    m, n = 192, 96
    D = rng.standard_normal((m, n)).astype(f32)
    xt = (rng.standard_normal(n) * (rng.random(n) < 0.4))
    s = (D.astype(np.float64) @ xt + 0.05 * rng.standard_normal(m)).astype(f32)

    # elasticnet at alpha=0 == ridge closed form (host f64 truth).
    lam = 0.8
    res = elasticnet(D, s, lam, alpha=0.0, config=cfg)
    xstar = np.linalg.solve(
        D.astype(np.float64).T @ D.astype(np.float64) + lam * np.eye(n),
        D.astype(np.float64).T @ s.astype(np.float64))
    err = np.linalg.norm(np.asarray(res.zopt) - xstar) / np.linalg.norm(xstar)
    emit("elasticnet_ridge", 1e-3, err, res)

    # grouplasso singleton groups == lasso-style KKT stationarity.
    res = grouplasso(D, s, 0.5, np.arange(n), config=cfg)
    z = np.asarray(res.zopt, np.float64)
    g = D.astype(np.float64).T @ (D.astype(np.float64) @ z
                                  - s.astype(np.float64))
    act = np.abs(z) > 1e-6
    kkt = max(
        float(np.max(np.abs(g[act] + 0.5 * np.sign(z[act])))) if act.any()
        else 0.0,
        float(max(np.max(np.abs(g[~act])) - 0.5, 0.0)) if (~act).any()
        else 0.0)
    emit("grouplasso_kkt", 5e-3, kkt, res)

    # nnls: feasibility + KKT sign conditions.
    res = nnls(D, s, config=cfg)
    z = np.asarray(res.zopt, np.float64)
    g = D.astype(np.float64).T @ (D.astype(np.float64) @ z
                                  - s.astype(np.float64))
    kkt = max(float(np.max(np.abs(g[z > 1e-6]), initial=0.0)),
              float(max(-np.min(g[z <= 1e-6], initial=0.0), 0.0)),
              float(max(-np.min(z), 0.0)))
    emit("nnls_kkt", 5e-3, kkt, res)

    # quantile: objective vs the host-side LP oracle (scipy linprog).
    from scipy.optimize import linprog

    tau = 0.7
    res = quantile(D, s, tau, cfg)
    r_ = D.astype(np.float64) @ np.asarray(res.xopt, np.float64) - s
    f_admm = float(np.sum(np.maximum(tau * r_, (tau - 1) * r_)))
    out = linprog(np.r_[np.zeros(n), tau * np.ones(m), (1 - tau) * np.ones(m)],
                  A_eq=np.c_[D.astype(np.float64), -np.eye(m), np.eye(m)],
                  b_eq=s.astype(np.float64),
                  bounds=[(None, None)] * n + [(0, None)] * (2 * m),
                  method="highs")
    emit("quantile_lp_oracle", 1e-3, abs(f_admm - out.fun) / abs(out.fun),
         res, extra={"f_lp": round(float(out.fun), 6)})

    # fusedlasso: lam2=0 degenerates to the soft-threshold closed form.
    from admm_tpu import fusedlasso

    sig = (np.repeat(rng.standard_normal(8), 24)
           + 0.3 * rng.standard_normal(192)).astype(f32)
    res = fusedlasso(sig, 0.4, 0.0, cfg)
    truth = np.sign(sig) * np.maximum(np.abs(sig) - 0.4, 0.0)
    err = (np.linalg.norm(np.asarray(res.xopt, np.float64) - truth)
           / max(np.linalg.norm(truth), 1e-30))
    emit("fusedlasso_softthresh", 1e-3, err, res)

    # sdp: objective gap vs the constructed primal-dual optimum
    # (models.sdp.random_sdp_instance KKT triple), eigh and NS z-prox.
    from admm_tpu import sdp as _sdp
    from admm_tpu.models.sdp import random_sdp_instance

    C, Asd, bsd, Xstar, _, _ = random_sdp_instance(16, 24, 6, rng,
                                                   dtype=f32)
    pstar = float(np.sum(C.astype(np.float64) * Xstar.astype(np.float64)))
    for pm, bar in (("eigh", 1e-3), ("ns", 1e-2)):
        res = _sdp(C, Asd, bsd, config=cfg, prox_method=pm, ns_iters=30)
        obj = float(np.sum(C.astype(np.float64)
                           * np.asarray(res.zopt, np.float64)))
        err = abs(obj - pstar) / max(1.0, abs(pstar))
        emit(f"sdp_gap_{pm}", bar, err, res)

    # exchange ADMM: quadratic market equilibrium (host f64 oracle).
    from admm_tpu.parallel import exchange_quadratic

    Wx, mx, nx = 8, 24, 12
    Ax = rng.standard_normal((Wx, mx, nx)).astype(f32)
    bx = rng.standard_normal((Wx, mx)).astype(f32)
    Ginv = np.stack([np.linalg.inv(A.astype(np.float64).T
                                   @ A.astype(np.float64)) for A in Ax])
    Atb = np.einsum("wmi,wm->wi", Ax.astype(np.float64),
                    bx.astype(np.float64))
    nu = np.linalg.solve(Ginv.sum(0), np.einsum("wij,wj->i", Ginv, Atb))
    xeq = np.einsum("wij,wj->wi", Ginv, Atb - nu[None, :])
    res = exchange_quadratic(Ax, bx, config=cfg)
    err = (np.linalg.norm(np.asarray(res.xopt, np.float64) - xeq)
           / np.linalg.norm(xeq))
    emit("exchange_equilibrium", 1e-3, err, res)

    # rpca: planted low-rank + sparse recovery at f32.
    nr = 96
    L0 = (rng.standard_normal((nr, 4)) @ rng.standard_normal((4, nr)))
    S0 = (rng.random((nr, nr)) < 0.05) * (5 * rng.standard_normal((nr, nr)))
    res = rpca((L0 + S0).astype(f32),
               config=ADMMConfig(maxiters=3000, abstol=1e-7, reltol=1e-6,
                                 stallwindow=100))
    err = (np.linalg.norm(np.asarray(res.xopt, np.float64) - L0)
           / np.linalg.norm(L0))
    emit("rpca_recovery", 1e-3, err, res)

    # Anderson acceleration on the SDP (round-5 engine variant,
    # ADMMConfig.anderson): KKT-gap oracle on a dedicated n=64 m=128
    # instance at tolerances f32 MEETS (1e-5 Boyd), so both runs
    # converge cleanly and the step counts compare two converged
    # trajectories (at the f32-floor tolerances of the sdp_gap rows
    # both runs plateau-stop and the comparison is stall noise).
    # CPU f32 calibration, seeds 7/8/9: plain 63-68 steps, aa10 38-39
    # (1.7x), gaps 1e-4..2e-3.
    rng_aa = np.random.default_rng(7)
    Caa, Aaa, baa, Xaa, _, _ = random_sdp_instance(64, 128, 8, rng_aa,
                                                   dtype=f32)
    paa = float(np.sum(Caa.astype(np.float64) * Xaa.astype(np.float64)))
    cfg_aa = dict(maxiters=8000, abstol=1e-5, reltol=1e-5, stallwindow=200)
    res_pl = _sdp(Caa, Aaa, baa, config=ADMMConfig(**cfg_aa),
                  prox_method="eigh")
    res = _sdp(Caa, Aaa, baa, config=ADMMConfig(anderson=10, **cfg_aa),
               prox_method="eigh")
    obj = float(np.sum(Caa.astype(np.float64)
                       * np.asarray(res.zopt, np.float64)))
    err = abs(obj - paa) / max(1.0, abs(paa))
    emit("sdp_gap_eigh_aa10", 5e-3, err, res,
         extra={"steps_plain": int(res_pl.steps)})

    # Ruiz preconditioning (round 5, linearprogram precondition=True):
    # a badly row/column-scaled LP (scales 10^±2) against the host-side
    # f64 HiGHS optimum; the unpreconditioned step count is stamped for
    # contrast.  CPU f32 calibration: rel 5.2e-4 at 319 steps vs 763
    # unpreconditioned.
    from scipy.optimize import linprog as _linprog

    from admm_tpu import linearprogram as _lp

    mlp, nlp = 48, 144
    Dlp = rng.standard_normal((mlp, nlp))
    slp = Dlp @ np.abs(rng.standard_normal(nlp))
    blp = np.abs(rng.standard_normal(nlp)) + 0.1
    Glp = 10.0 ** rng.uniform(-2, 2, mlp)
    Flp = 10.0 ** rng.uniform(-2, 2, nlp)
    Dbad = (Glp[:, None] * Dlp * Flp[None, :]).astype(f32)
    sbad = (Glp * slp).astype(f32)
    bbad = (Flp * blp).astype(f32)
    out = _linprog(bbad.astype(np.float64), A_eq=Dbad.astype(np.float64),
                   b_eq=sbad.astype(np.float64), bounds=[(0, None)] * nlp,
                   method="highs")
    res = _lp(bbad, Dbad, sbad, cfg, precondition=True)
    res_npc = _lp(bbad, Dbad, sbad, cfg)
    f_pre = float(bbad.astype(np.float64) @ np.asarray(res.xopt, np.float64))
    err = abs(f_pre - out.fun) / (1.0 + abs(out.fun))
    emit("lp_precond_badscale", 2e-3, err, res,
         extra={"f_highs": round(float(out.fun), 6),
                "steps_unpreconditioned": int(res_npc.steps)})

    return rows


def main(smoke=False, out_path="BENCH_MATRIX.json"):
    import jax

    # Persistent compile cache: the matrix compiles ~30 programs, and on
    # the remote-compile TPU relay each costs minutes — caching makes
    # reruns (and the driver's headline bench) near-free.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    platform = jax.devices()[0].platform
    t0 = time.time()
    timing = timing_matrix(smoke=smoke)
    acc = accuracy_matrix(smoke=smoke)
    doc = {
        "platform": platform,
        "smoke": smoke,
        "wall_s": round(time.time() - t0, 1),
        # Per-solve dispatch floor (t(N) = a*N + b): raw iters_per_sec
        # includes b/N; marginal_iter_s is the cross-N-comparable rate.
        "dispatch_floor_ms": (round(_DISPATCH["floor_s"] * 1e3, 3)
                              if _DISPATCH["floor_s"] else None),
        "timing": timing,
        "f32_oracle_accuracy": acc,
    }
    Path(out_path).write_text(json.dumps(doc, indent=1))
    print(f"# wrote {out_path} ({platform}, {doc['wall_s']}s)")
    return doc


if __name__ == "__main__":
    import sys

    main(smoke="--smoke" in sys.argv)
