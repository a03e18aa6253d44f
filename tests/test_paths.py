"""Batched regularization-path solves (models/paths.py)."""

import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.paths import lasso_path, linearsvm_c_path


def test_lasso_path_matches_individual_solves():
    from admm_tpu import lasso

    rng = np.random.default_rng(0)
    D = rng.standard_normal((128, 64))
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    testx = rng.standard_normal(64) * (rng.random(64) < 0.5)
    s = D @ testx + 0.03 * rng.standard_normal(128)
    lam_max = np.max(np.abs(D.T @ s))
    lams = lam_max * np.array([0.5, 0.1, 0.02])

    cfg = ADMMConfig(maxiters=5000)
    path = lasso_path(D, s, lams, cfg)
    assert path.xopt.shape == (3, 64)

    for i, lam in enumerate(lams):
        solo = lasso(D, s, float(lam), cfg)
        np.testing.assert_allclose(
            np.asarray(path.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(path.steps[i]) == solo.steps
    # Smaller lambda -> denser solution (sanity on the path semantics).
    nnz = [(np.abs(np.asarray(path.zopt[i])) > 1e-8).sum() for i in range(3)]
    assert nnz[0] <= nnz[-1]


def test_svm_c_path_runs():
    rng = np.random.default_rng(1)
    mpos = 64
    bp = np.linspace(0, 2, mpos)
    pos = np.stack([bp + rng.random(mpos) - 0.25 * rng.random(mpos),
                    bp - rng.random(mpos) + 0.25 * rng.random(mpos)], 1)
    neg = np.stack([bp - rng.random(mpos) + 0.25 * rng.random(mpos),
                    bp + rng.random(mpos) - 0.25 * rng.random(mpos)], 1)
    D = np.concatenate([pos, neg])
    ell = np.concatenate([np.ones(mpos), -np.ones(mpos)])

    Cs = np.array([0.1, 1.0, 10.0])
    path = linearsvm_c_path(D, ell, Cs, ADMMConfig(maxiters=500))
    assert path.xopt.shape == (3, 2)
    # Each lane recovers a separator with positive slope parameter x1.
    x = np.asarray(path.xopt)
    assert np.all(np.isfinite(x))


def test_covsel_path_matches_individual_solves():
    """Graphical-lasso path (batched NS prox) tracks per-lambda serial
    solves lane-for-lane, including matrix-valued iterate shapes."""
    from admm_tpu import covarianceselection
    from admm_tpu.models.paths import covsel_path

    rng = np.random.default_rng(2)
    n = 16
    Sinv = np.eye(n)
    Sinv[1, 5] = Sinv[5, 1] = 0.8
    D = rng.multivariate_normal(np.zeros(n), np.linalg.inv(Sinv), size=200)
    lams = np.array([2.0, 0.5, 0.1])

    cfg = ADMMConfig(maxiters=500)
    path = covsel_path(D, lams, cfg)
    assert path.xopt.shape == (3, n, n)

    for i, lam in enumerate(lams):
        solo = covarianceselection(D, float(lam), cfg, prox_method="ns")
        np.testing.assert_allclose(
            np.asarray(path.xopt[i]), np.asarray(solo.xopt), atol=1e-8)
        assert int(path.steps[i]) == int(solo.steps)
    # Larger lambda -> sparser off-diagonal pattern (path semantics).
    offdiag_nnz = [
        (np.abs(np.asarray(path.zopt[i]) - np.diag(np.diag(np.asarray(path.zopt[i])))) > 1e-8).sum()
        for i in range(3)
    ]
    assert offdiag_nnz[0] <= offdiag_nnz[-1]


def test_tv_path_matches_individual_solves():
    """TV denoising-strength sweep: lanes match serial solves for both
    the dense and cyclic-reduction x-prox paths."""
    from admm_tpu import totalvariation
    from admm_tpu.models.paths import tv_path

    rng = np.random.default_rng(4)
    n = 128
    clean = np.repeat(rng.standard_normal(8), n // 8)
    s = clean + 0.3 * rng.standard_normal(n)
    lams = np.array([2.0, 0.5, 0.05])

    cfg = ADMMConfig(maxiters=2000)
    for solver in ("dense", "cr"):
        path = tv_path(s, lams, cfg, solver=solver)
        assert path.xopt.shape == (3, n)
        for i, lam in enumerate(lams):
            solo = totalvariation(s, float(lam), cfg, solver=solver)
            np.testing.assert_allclose(
                np.asarray(path.xopt[i]), np.asarray(solo.xopt), atol=1e-8)
            assert int(path.steps[i]) == int(solo.steps)
    # Stronger lambda flattens more: TV seminorm decreases with lambda.
    tvnorm = [np.abs(np.diff(np.asarray(path.xopt[i]))).sum() for i in range(3)]
    assert tvnorm[0] <= tvnorm[1] <= tvnorm[2]


def test_lasso_path_unroll_exact():
    """vmap x unroll interplay: the batched path with unroll=4 must
    match unroll=1 lane-for-lane (per-lane stop masking composes with
    the unroll discard mask)."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.models.paths import lasso_path

    rng = np.random.default_rng(0)
    D = rng.standard_normal((64, 32))
    s = rng.standard_normal(64)
    lams = np.geomspace(0.01, 1.0, 8)
    base = lasso_path(D, s, lams, ADMMConfig(maxiters=501))
    un = lasso_path(D, s, lams, ADMMConfig(maxiters=501, unroll=4))
    np.testing.assert_array_equal(np.asarray(un.steps), np.asarray(base.steps))
    np.testing.assert_array_equal(np.asarray(un.xopt), np.asarray(base.xopt))
