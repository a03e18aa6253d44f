"""Parallel vs serial unwrapped-ADMM SVM benchmark.

Mirrors reference examples/unwrappedadmmtest.m:29-58: train the linear
SVM serially and with the distributed transpose-reduction path (the
reference's "Two-core" comparison on a local pool) across problem scales
and report runtimes + agreement of the recovered separators.

Usage:  python examples/unwrappedadmmtest.py
"""

from __future__ import annotations

import numpy as np


def _svm_instance(seed, mpos, mneg, sep=0.5):
    from admm_tpu.testers.problems import make_svm_instance

    return make_svm_instance(seed, mpos, mneg, sep)


def unwrappedadmmtest(scales=(7, 9, 11), C=1.0, seed=0, quiet=False):
    from admm_tpu import ADMMConfig, linearsvm
    from admm_tpu.parallel import linearsvm_sharded, make_mesh

    mesh = make_mesh()
    out = {}
    for sc in scales:
        m = 2**sc
        D, ell = _svm_instance(seed, m, m)
        cfg = ADMMConfig(maxiters=1000)
        serial = linearsvm(D, ell, C, cfg)
        # warm (compiled) timing: run twice, report the second
        serial = linearsvm(D, ell, C, cfg)
        par = linearsvm_sharded(D, ell, C, cfg, mesh=mesh)
        par = linearsvm_sharded(D, ell, C, cfg, mesh=mesh)
        xs, xp = np.asarray(serial.xopt), np.asarray(par.xopt)
        slope_gap = abs((-xs[1] / xs[0]) - (-xp[1] / xp[0]))
        out[sc] = (serial.runtime, par.runtime, slope_gap)
        if not quiet:
            print(f"2^{sc} rows: serial {serial.runtime:.3f}s, "
                  f"sharded({mesh.devices.size} dev) {par.runtime:.3f}s, "
                  f"separator gap {slope_gap:.2e}")
    return out


if __name__ == "__main__":
    unwrappedadmmtest()
