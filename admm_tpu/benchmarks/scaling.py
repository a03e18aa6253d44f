"""Weak-scaling benchmark for consensus-ADMM LASSO.

BASELINE.md target: >= 80% weak-scaling efficiency at 2+ workers.  Rows
grow with the shard count (constant per-device work: base_rows per
shard); efficiency(W) = iters_per_sec(W) / iters_per_sec(1).  On a single
host this runs over the virtual CPU mesh (the cluster-free analog of the
reference's local pool, SURVEY.md section 4); on a pod it runs over real
chips via jax.distributed.

Prints one JSON line per shard count plus a summary line.

Usage:  python benchmarks/scaling.py [--devices 8] [--rows-per-shard 4096]
        [--cols 512] [--iters 300]
"""

from __future__ import annotations

import json
import sys


def weak_scaling(device_counts=(1, 2, 4, 8), rows_per_shard=4096, cols=512,
                 iters=300, quiet=False):
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso, make_mesh

    cfg = ADMMConfig(maxiters=iters, domaxiters=True)
    results = {}
    for W in device_counts:
        rng = np.random.default_rng(0)
        m = rows_per_shard * W
        D = rng.standard_normal((m, cols)).astype(np.float32)
        s = rng.standard_normal(m).astype(np.float32)
        mesh = make_mesh(W)
        consensus_lasso(D, s, 0.1, cfg, mesh=mesh, nshards=W)  # compile
        res = consensus_lasso(D, s, 0.1, cfg, mesh=mesh, nshards=W)
        ips = iters / res.runtime
        results[W] = ips
        if not quiet:
            print(json.dumps({
                "metric": "consensus_lasso_weak_scaling",
                "devices": W,
                "rows": m,
                "cols": cols,
                "value": round(ips, 2),
                "unit": "iter/s",
            }))
    base = results[min(results)]
    effs = {W: results[W] / base for W in results}
    if not quiet:
        import jax

        virtual = jax.devices()[0].platform == "cpu"
        line = {
            "metric": "weak_scaling_efficiency",
            "efficiency": {str(W): round(e, 3) for W, e in effs.items()},
            "target": 0.8,
        }
        if virtual:
            # Virtual host-platform devices share the physical cores:
            # every extra "device" adds real work to the same silicon, so
            # efficiency here validates CORRECTNESS of the sharded
            # program, not scaling.  Run on a pod slice for real numbers.
            line["caveat"] = "virtual CPU devices share one host; not a scaling measurement"
        print(json.dumps(line))
    return results, effs


def _ensure_devices(n: int) -> None:
    """Standalone runs need a virtual CPU mesh when the default backend
    has fewer than n devices; must run before jax initializes."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    if len(jax.devices()) < n:
        raise SystemExit(
            f"need {n} devices but the initialized backend has "
            f"{len(jax.devices())}; start with JAX_PLATFORMS unset and let "
            "this script configure the virtual CPU mesh, or pass --devices 1"
        )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rows-per-shard", type=int, default=4096)
    ap.add_argument("--cols", type=int, default=512)
    ap.add_argument("--iters", type=int, default=300)
    a = ap.parse_args()
    if a.devices > 1:
        import jax

        jax.config.update("jax_platforms", "cpu")
        _ensure_devices(a.devices)
    counts = [w for w in (1, 2, 4, 8) if w <= a.devices]
    weak_scaling(device_counts=counts, rows_per_shard=a.rows_per_shard,
                 cols=a.cols, iters=a.iters)
