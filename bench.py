"""Driver entry: the headline benchmark (one JSON line).

Thin wrapper so the repo-root contract (`python bench.py [--smoke]`)
and the installed console script (`admm-tpu bench`, which imports
benchmarks.headline from the wheel) share one implementation."""

from admm_tpu.benchmarks.headline import main


def _ensure_live_backend(probe_timeout: int = 300) -> None:
    """The axon TPU tunnel can go down for hours, and jax.devices() then
    HANGS on backend init (observed 2026-08-18) — which would leave the
    driver with no bench line at all.  Probe it in a killable subprocess
    first; if dead, fall back to CPU so the run still emits its JSON
    (with the platform visible in the numbers)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); import sys; "
             "sys.exit(0 if any(x.platform != 'cpu' for x in d) else 1)"],
            timeout=probe_timeout, capture_output=True,
        )
        if r.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    print("# TPU backend unavailable (probe failed) — falling back to CPU",
          file=sys.stderr)
    import jax

    jax.config.update("jax_platforms", "cpu")


if __name__ == "__main__":
    import sys

    _ensure_live_backend()
    if "--matrix" in sys.argv:
        # Per-solver TPU timing + f32 oracle accuracy matrix
        # (admm_tpu/benchmarks/matrix.py); writes BENCH_MATRIX.json.  The default
        # (driver) mode stays the single headline JSON line.
        from admm_tpu.benchmarks.matrix import main as matrix_main

        matrix_main(smoke="--smoke" in sys.argv)
    elif "--sweep" in sys.argv:
        # On-device multi-scale solvertester sweep (the reference's
        # harness run on TPU f32); writes BENCH_SWEEP.json.
        from admm_tpu.benchmarks.sweep import main as sweep_main

        sweep_main(smoke="--smoke" in sys.argv)
    else:
        main(smoke="--smoke" in sys.argv)
