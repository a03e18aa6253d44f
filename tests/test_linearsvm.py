"""Oracle test for the linear SVM, mirroring reference
testers/linearsvmtest.m:130-200: synthetic linearly separable 2-D classes
around the x1 = x2 line with margin ``sep``; both hinge and 0-1 loss must
recover slope ~1 (relative error <= 0.05) and beat the theoretical
objective at x = [1; -1]."""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, linearsvm


def _make_instance(seed, mpos, mneg, sep):
    rng = np.random.default_rng(seed)
    base_p = np.linspace(0, 2, mpos)
    base_n = np.linspace(0, 2, mneg)
    pos = np.stack(
        [base_p + rng.random(mpos) - sep * rng.random(mpos),
         base_p - rng.random(mpos) + sep * rng.random(mpos)], axis=1
    )
    neg = np.stack(
        [base_n - rng.random(mneg) + sep * rng.random(mneg),
         base_n + rng.random(mneg) - sep * rng.random(mneg)], axis=1
    )
    D = np.concatenate([pos, neg], axis=0)
    ell = np.concatenate([np.ones(mpos), -np.ones(mneg)])
    return D, ell


def _obj(D, ell, C, x, loss):
    v = ell * (D @ x)
    if loss == "hinge":
        return 0.5 * np.sum(x * x) + C * np.sum(np.maximum(1.0 - v, 0.0))
    return 0.5 * np.sum(x * x) + C * np.sum(np.maximum(np.sign(1.0 - v), 0.0))


@pytest.mark.parametrize("loss", ["hinge", "01"])
def test_svm_recovers_separator(loss):
    C = 1.0
    sep = 0.5
    errtol = 0.05
    D, ell = _make_instance(0, 128, 128, sep)
    trueobj = _obj(D, ell, C, np.array([1.0, -1.0]), loss)
    res = linearsvm(D, ell, C, ADMMConfig(objevals=True, maxiters=1000), loss=loss)
    x = np.asarray(res.xopt)
    relerror = abs(1.0 - (-x[1] / x[0]))
    assert relerror <= errtol, f"slope rel-err {relerror}"
    assert _obj(D, ell, C, x, loss) < trueobj


def test_zero_one_prox_matches_definition():
    """minz01 keeps entries where s >= 1 or s < 1 - sqrt(2/t), else 1
    (getProxOps.m:1158-1180)."""
    from admm_tpu.ops.prox import zero_one_prox

    rng = np.random.default_rng(1)
    m = 64
    Dx_plus_u = rng.standard_normal(m) * 2
    ell = np.sign(rng.standard_normal(m))
    C, rho = 0.7, 1.3
    z = np.asarray(zero_one_prox(Dx_plus_u, ell, C, rho))
    s = ell * Dx_plus_u
    t = rho / C
    keep = (s >= 1) | (s < 1 - np.sqrt(2 / t))
    y = np.where(keep, s, 1.0)
    np.testing.assert_allclose(z, ell * y, atol=1e-12)
