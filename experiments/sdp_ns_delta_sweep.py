"""Round-5 probe: SDP Newton-Schulz projection at scale + the ns_delta
sweep (VERDICT round 4, weak #6).

Round-4 facts: sdp_batch NS = 19.1x the batched in-loop eigh at n=128,
and the covsel bf16-coarse + residual-correction recipe DIVERGES as a
PSD projection with delta = 0 (the correction's inverse root blows up
on the near-singular W^2).  Open questions this probe answers:

1. Does the NS advantage hold at n = 256 / 512 (serial + batched)?
2. Does a regularized root (ns_delta > 0) let the bf16-coarse +
   correction recipe recover its ~2x over plain full-precision NS —
   and at what accuracy cost (the root error floor is O(delta))?

Instances: batched max-cut relaxations (diag constraint) — the z-prox
dominates, which is exactly what the sweep measures.  Accuracy metric:
rel-F distance of the final Z against the eigh-path run (the accuracy
reference), plus the diag-feasibility residual.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from admm_tpu import ADMMConfig  # noqa: E402
from admm_tpu.models.batch import sdp_batch  # noqa: E402
from admm_tpu.models.sdp import sdp  # noqa: E402

f32 = np.float32
rng = np.random.default_rng(0)


def _laplacians(B, n):
    W = (rng.random((B, n, n)) < 0.1).astype(f32)
    W = np.triu(W, 1)
    W = W + np.swapaxes(W, 1, 2)
    return (np.stack([np.diag(W[i].sum(-1)) for i in range(B)])
            - W).astype(f32)


def _relF(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def scale_rows():
    """eigh vs NS at n = 256 (batched B=4) and n = 512 (serial)."""
    print("== NS-vs-eigh at scale ==", flush=True)
    for B, n, iters in ((4, 256, 60), (1, 512, 40)):
        Lap = _laplacians(max(B, 1), n)
        bvec = np.ones(n, f32)
        cfg = ADMMConfig(maxiters=iters, domaxiters=True)
        runs = {}
        for pm, kw in (("eigh", {}), ("ns", {"ns_iters": 16})):
            if B > 1:
                fn = lambda pm=pm, kw=kw: sdp_batch(
                    -0.25 * Lap, "diag", bvec, cfg, prox_method=pm, **kw)
            else:
                fn = lambda pm=pm, kw=kw: sdp(
                    -0.25 * Lap[0], "diag", bvec, config=cfg,
                    prox_method=pm, **kw)
            t0 = time.perf_counter()
            res = fn()
            np.asarray(res.zopt)
            print(f"  warmup B={B} n={n} {pm}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            best = np.inf
            for _ in range(3):
                res = fn()
                np.asarray(res.zopt)
                best = min(best, res.runtime)
            runs[pm] = (best, res)
        te, re_ = runs["eigh"]
        tn, rn = runs["ns"]
        acc = _relF(rn.zopt, re_.zopt)
        print(f"  B={B} n={n}: eigh {B*iters/te:8.1f} inst-iters/s, "
              f"ns {B*iters/tn:8.1f} ({te/tn:4.1f}x), relF(ns,eigh)={acc:.2e}",
              flush=True)


def delta_sweep():
    """bf16-coarse + corrections with a regularized root, vs plain NS."""
    print("== ns_delta sweep (B=16, n=128, bf16-coarse + 2 corrections) ==",
          flush=True)
    B, n, iters = 16, 128, 100
    Lap = _laplacians(B, n)
    bvec = np.ones(n, f32)
    cfg = ADMMConfig(maxiters=iters, domaxiters=True)

    ref = sdp_batch(-0.25 * Lap, "diag", bvec, cfg)  # eigh reference
    np.asarray(ref.zopt)
    ref = sdp_batch(-0.25 * Lap, "diag", bvec, cfg)
    np.asarray(ref.zopt)
    t_eigh = ref.runtime

    def trial(name, **kw):
        fn = lambda: sdp_batch(-0.25 * Lap, "diag", bvec, cfg,
                               prox_method="ns", ns_iters=16, **kw)
        res = fn()
        np.asarray(res.zopt)
        best = np.inf
        for _ in range(3):
            res = fn()
            np.asarray(res.zopt)
            best = min(best, res.runtime)
        finite = bool(np.all(np.isfinite(np.asarray(res.zopt))))
        acc = _relF(res.zopt, ref.zopt) if finite else float("nan")
        feas = (float(np.abs(np.diagonal(np.asarray(res.xopt), axis1=1,
                                         axis2=2) - 1.0).max())
                if finite else float("nan"))
        print(f"  {name:34s} {B*iters/best:9.1f} inst-iters/s "
              f"({t_eigh/best:5.1f}x eigh)  finite={finite}  "
              f"relF_vs_eigh={acc:.2e}  diag_feas={feas:.1e}", flush=True)

    trial("plain_ns (full precision)")
    for delta in (1e-3, 1e-2, 3e-2, 1e-1):
        trial(f"bf16coarse+2corr delta={delta:g}",
              ns_coarse=16, ns_correct=2, ns_delta=float(delta))
    # Coarse WITHOUT corrections (does raw bf16 even track?)
    trial("bf16coarse only (no corrections)", ns_coarse=16)


if __name__ == "__main__":
    scale_rows()
    delta_sweep()
