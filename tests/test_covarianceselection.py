"""Oracle test for covariance selection, mirroring reference
testers/covarianceselectiontest.m:112-154: build a sparse SPD inverse
covariance, sample Gaussians, and require the ADMM objective to beat the
true inverse covariance's objective.  Exercises matrix-valued iterates."""

import numpy as np

from admm_tpu import ADMMConfig, covarianceselection


def _make_instance(seed, rows, cols):
    rng = np.random.default_rng(seed)
    Sinv = np.diag(np.ones(cols))
    k = int(np.ceil(0.001 * cols * cols)) + 2
    idx = rng.choice(cols * cols, size=k, replace=False)
    Sinv.flat[idx] = 1.0
    Sinv = Sinv + Sinv.T
    w = np.linalg.eigvalsh(Sinv)
    if w.min() < 0:
        Sinv = Sinv + 1.1 * abs(w.min()) * np.eye(cols)
    S = np.linalg.inv(Sinv)
    D = rng.multivariate_normal(np.zeros(cols), S, size=rows)
    return D, Sinv, S


def _obj(S, X, Z, lam):
    sign, logdet = np.linalg.slogdet(X)
    return np.trace(S @ X) - logdet + lam * np.sum(np.abs(Z))


def test_covsel_beats_truth_objective():
    lam = 1.0
    D, Sinv, _ = _make_instance(0, 256, 32)
    # Objective uses the empirical covariance, as the reference does
    # (covarianceselectiontest.m:129 with S = cov(D) from the solver).
    from admm_tpu.models.covarianceselection import empirical_covariance

    S = np.asarray(empirical_covariance(D))
    res = covarianceselection(
        D, lam, ADMMConfig(objevals=True, maxiters=1000, convtest=True)
    )
    assert not res.diverged
    X = np.asarray(res.xopt)
    assert X.shape == (32, 32)
    assert _obj(S, X, X, lam) < _obj(S, Sinv, Sinv, lam)
    # X must be symmetric positive definite.
    np.testing.assert_allclose(X, X.T, atol=1e-8)
    assert np.linalg.eigvalsh(X).min() > 0
