"""Smoke tests for the profiling helpers and the weak-scaling harness."""

import numpy as np
import pytest


def test_iteration_rate():
    import jax.numpy as jnp

    from admm_tpu.utils.profiling import iteration_rate

    x = jnp.ones(64)
    rate = iteration_rate(lambda: x * 2.0, warmup=1, repeats=3)
    assert rate > 0


def test_profiler_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from admm_tpu.utils.profiling import trace

    try:
        with trace(str(tmp_path)):
            jax.block_until_ready(jnp.ones(128) * 3.0)
    except Exception as e:  # profiler backends vary by platform
        pytest.skip(f"profiler unavailable: {e}")
    assert any(tmp_path.rglob("*")), "no trace artifacts written"


def test_weak_scaling_harness_runs():
    from admm_tpu.benchmarks.scaling import weak_scaling

    results, effs = weak_scaling(
        device_counts=(1, 2), rows_per_shard=64, cols=16, iters=20, quiet=True
    )
    assert set(results) == {1, 2}
    assert all(v > 0 for v in results.values())
    assert effs[1] == 1.0


def test_collective_microbench_and_cost_model():
    """Round-5 pre-pod scaling evidence (VERDICT r4 next #7): the
    collective microbench runs on the available mesh, and the
    ring-all-reduce cost model behaves monotonically (more compute per
    iteration -> higher predicted efficiency; DCN worse than ICI)."""
    from admm_tpu.benchmarks.scaling import (breakeven_table,
                                             collective_microbench,
                                             predict_weak_scaling)

    rows = collective_microbench(payload_cols=(64,), inner=8, quiet=True)
    assert rows and rows[0]["us_per_collective"] > 0

    lo = predict_weak_scaling(20.0, 512, quiet=True)
    hi = predict_weak_scaling(2000.0, 512, quiet=True)
    by = {(r["tier"], r["devices"]): r for r in lo}
    by_hi = {(r["tier"], r["devices"]): r for r in hi}
    for k in by:
        assert by_hi[k]["efficiency"] > by[k]["efficiency"]
    # Big-body consensus meets the target on the ICI slice.
    assert by_hi[("ici_v5e", 8)]["meets_target"]
    # DCN is strictly worse than ICI at the same compute.
    assert (by[("dcn", 2)]["efficiency"] < by[("ici_v5e", 8)]["efficiency"])

    be = breakeven_table(512, lanes=(1, 8), quiet=True)
    per = {(r["tier"], r["lanes"]): r for r in be}
    # Lanes amortize the latency: the per-lane compute needed for 80%
    # falls as B grows.
    assert (per[("ici_v5e", 8)]["min_per_lane_compute_us_for_80pct"]
            < per[("ici_v5e", 1)]["min_per_lane_compute_us_for_80pct"])
