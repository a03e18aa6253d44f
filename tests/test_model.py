"""Oracle test for the model problem.

Mirrors reference testers/modeltest.m: random normal P, Q, r, s; the exact
optimum is x* = (P^T P + Q^T Q)^{-1} (P^T r + Q^T s) (modeltest.m:114-124);
assert objective relative error <= errtol AND ||x* - x|| <= errtol
(modeltest.m:147-177) with the tester's settings (objevals, maxiters=10000,
convtest, stopcond='both'; modeltest.m:127-133).
"""

import numpy as np
import pytest

from admm_tpu import ADMMConfig
from admm_tpu.models.model import model


def _make_instance(seed, rows, cols):
    rng = np.random.default_rng(seed)
    P = rng.standard_normal((rows, cols))
    Q = rng.standard_normal((rows, cols))
    r = rng.standard_normal(rows)
    s = rng.standard_normal(rows)
    truex = np.linalg.solve(P.T @ P + Q.T @ Q, P.T @ r + Q.T @ s)
    trueobj = 0.5 * np.sum((P @ truex - r) ** 2) + 0.5 * np.sum((Q @ truex - s) ** 2)
    return P, Q, r, s, truex, trueobj


@pytest.mark.parametrize("seed,rows,cols", [(0, 128, 128), (1, 96, 64)])
def test_model_matches_closed_form(seed, rows, cols):
    errtol = 1e-3
    P, Q, r, s, truex, trueobj = _make_instance(seed, rows, cols)
    cfg = ADMMConfig(objevals=True, maxiters=10000, convtest=True, stopcond="both")
    res = model(P, Q, r, s, cfg)
    assert not res.diverged
    assert res.steps < cfg.maxiters

    xopt = np.asarray(res.xopt)
    objopt = 0.5 * np.sum((P @ xopt - r) ** 2) + 0.5 * np.sum((Q @ xopt - s) ** 2)
    objerror = abs(1.0 - objopt / trueobj)
    xresidual = np.linalg.norm(truex - xopt)
    assert objerror <= errtol, f"objective rel-err {objerror} > {errtol}"
    assert xresidual <= errtol, f"x residual {xresidual} > {errtol}"


def test_model_records_history():
    P, Q, r, s, truex, trueobj = _make_instance(3, 64, 64)
    cfg = ADMMConfig(objevals=True, maxiters=5000, stopcond="both", convtest=True)
    res = model(P, Q, r, s, cfg)
    assert res.pnorm.shape == (res.steps,)
    assert np.all(np.isfinite(res.pnorm))
    assert res.objevals is not None
    # Objective trace should approach the true optimum.
    assert abs(res.objevals[-1] / trueobj - 1.0) < 1e-3
    assert res.Hnormsq is not None
    # Final H-norm increment should be tiny at convergence.
    assert res.Hnormsq[-1] <= 1e-5


def test_model_warm_start_converges_faster():
    """Warm start (reference options x0/z0/u0, admm.m:252-254): restarting
    from a converged state should stop almost immediately."""
    P, Q, r, s, truex, trueobj = _make_instance(5, 64, 64)
    cfg = ADMMConfig(maxiters=10000)
    cold = model(P, Q, r, s, cfg)
    from admm_tpu.engine import Hooks, admm
    from admm_tpu.models.model import make_prox_ops

    prox_f, prox_g, obj, data = make_prox_ops(P, Q, r, s, cfg)
    warm = admm(
        prox_f, prox_g, cfg, A=1.0, B=-1.0, c=0.0, m=len(truex),
        x0=cold.xopt, z0=cold.zopt, u0=cold.uopt, hooks=Hooks(obj=obj),
        data=data,
    )
    assert warm.steps <= 2
    assert warm.steps < cold.steps
