"""Oracle test for Huber fitting, mirroring reference
testers/huberfittest.m:121-158: planted solution + Gaussian noise + sparse
large noise; the ADMM objective must beat the planted objective."""

import numpy as np

from admm_tpu import ADMMConfig, huberfit
from admm_tpu.models.huberfit import huber_loss


def _make_instance(seed, rows, cols):
    rng = np.random.default_rng(seed)
    testx = rng.standard_normal(cols)
    D = rng.standard_normal((rows, cols))
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    s = D @ testx + np.sqrt(0.01) * rng.standard_normal(rows)
    density = min(1.0, 200.0 / rows)
    s = s + 10.0 * rng.random(rows) * (rng.random(rows) < density)
    return D, s, testx


def _obj(v):
    v = np.asarray(v)
    return float(np.sum(np.where(np.abs(v) <= 1.0, 0.5 * v * v, np.abs(v) - 0.5)))


def test_huber_beats_planted_objective():
    D, s, testx = _make_instance(0, 512, 32)
    res = huberfit(D, s, ADMMConfig(objevals=True, convtest=True, maxiters=5000))
    assert not res.diverged
    xopt = np.asarray(res.xopt)
    assert _obj(D @ xopt - s) < _obj(D @ testx - s)


def test_huber_loss_matches_prox():
    """The huber penalty and its prox must be consistent: the prox output
    must minimize huber(z) + rho/2 (z - v)^2 (checked against a grid)."""
    from admm_tpu.ops.prox import huber_prox

    rho = 1.3
    v = np.linspace(-4, 4, 41)
    z = np.asarray(huber_prox(v, 0.0, 0.0, rho))
    zg = np.linspace(-6, 6, 20001)
    for vi, zi in zip(v, z):
        vals = np.asarray(huber_loss(zg)) + 0.5 * rho * (zg - vi) ** 2
        best = zg[np.argmin(vals)]
        assert abs(zi - best) < 2e-3, (vi, zi, best)
