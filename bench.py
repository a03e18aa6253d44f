"""Driver entry: the headline benchmark (one JSON line).

Thin wrapper so the repo-root contract (`python bench.py [--smoke]`)
and the installed console script (`admm-tpu bench`, which imports
benchmarks.headline from the wheel) share one implementation."""

from admm_tpu.benchmarks.headline import main

if __name__ == "__main__":
    import sys

    if "--matrix" in sys.argv:
        # Per-solver TPU timing + f32 oracle accuracy matrix
        # (admm_tpu/benchmarks/matrix.py); writes BENCH_MATRIX.json.  The default
        # (driver) mode stays the single headline JSON line.
        from admm_tpu.benchmarks.matrix import main as matrix_main

        matrix_main(smoke="--smoke" in sys.argv)
    else:
        main(smoke="--smoke" in sys.argv)
