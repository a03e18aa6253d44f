"""Instance-batched solvers (models/batch.py): every lane must match
the corresponding serial solve exactly (same trajectory, same steps)."""

import numpy as np
import pytest

from admm_tpu import (
    ADMMConfig,
    basispursuit,
    basispursuit_batch,
    huberfit,
    huberfit_batch,
    lad,
    lad_batch,
    lasso,
    lasso_batch,
    totalvariation,
    tv_batch,
)


def _lasso_instances(B=3, m=48, n=96, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n))
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    X = rng.standard_normal((B, n)) * (rng.random((B, n)) < 0.2)
    S = X @ D.T + 0.02 * rng.standard_normal((B, m))
    return D, S


def test_lasso_batch_matches_serial_per_instance():
    D, S = _lasso_instances()
    lam = 0.1 * np.max(np.abs(S @ D))
    cfg = ADMMConfig(maxiters=3000)
    out = lasso_batch(D, S, lam, cfg)
    assert out.xopt.shape == (3, 96)
    for i in range(S.shape[0]):
        solo = lasso(D, S[i], float(lam), cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps
        np.testing.assert_allclose(
            float(out.objopt[i]), float(solo.objopt), rtol=1e-10
        )


def test_lasso_batch_per_instance_lambdas():
    D, S = _lasso_instances(B=2)
    lam0 = 0.1 * np.max(np.abs(S @ D))
    lams = np.array([lam0, 0.3 * lam0])
    cfg = ADMMConfig(maxiters=3000)
    out = lasso_batch(D, S, lams, cfg)
    for i, lam in enumerate(lams):
        solo = lasso(D, S[i], float(lam), cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )


def test_lasso_batch_skinny_and_fat_branches():
    # m < n exercises FatShiftSolver sharing; m >= n the Gram inverse.
    for m, n in ((32, 80), (80, 32)):
        rng = np.random.default_rng(m)
        D = rng.standard_normal((m, n))
        D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
        S = rng.standard_normal((2, m))
        lam = 0.2 * np.max(np.abs(S @ D))
        cfg = ADMMConfig(maxiters=2000)
        out = lasso_batch(D, S, lam, cfg)
        solo = lasso(D, S[1], float(lam), cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[1]), np.asarray(solo.xopt), atol=1e-8
        )


def test_lasso_batch_rejects_bad_shapes():
    D, S = _lasso_instances()
    with pytest.raises(ValueError, match="batch"):
        lasso_batch(D, S[0], 0.1)
    with pytest.raises(ValueError, match="batch"):
        lasso_batch(D, S[:, :-1], 0.1)


def test_basispursuit_batch_matches_serial_per_measurement():
    rng = np.random.default_rng(8)
    m, n, B = 32, 96, 3
    D = rng.standard_normal((m, n))
    X = rng.standard_normal((B, n)) * (rng.random((B, n)) < 0.1)
    S = X @ D.T  # exact measurements: BP recovers sparse X
    cfg = ADMMConfig(maxiters=3000)
    out = basispursuit_batch(D, S, cfg)
    for i in range(B):
        solo = basispursuit(D, S[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps
    # Feasibility: each recovered lane satisfies D x = s.
    res = np.asarray(out.xopt) @ D.T - S
    assert np.max(np.abs(res)) < 1e-5


def test_basispursuit_batch_rejects_overdetermined():
    rng = np.random.default_rng(9)
    with pytest.raises(ValueError, match="underdetermined"):
        basispursuit_batch(rng.standard_normal((64, 32)),
                           rng.standard_normal((2, 64)))


def test_tv_batch_matches_serial_per_signal():
    rng = np.random.default_rng(3)
    n, B = 128, 3
    steps = np.cumsum(rng.standard_normal((B, 5)), axis=1)
    S = np.repeat(steps, n // 5 + 1, axis=1)[:, :n]
    S = S + 0.1 * rng.standard_normal((B, n))
    cfg = ADMMConfig(maxiters=2000)
    out = tv_batch(S, 0.5, cfg)
    assert out.xopt.shape == (B, n)
    for i in range(B):
        solo = totalvariation(S[i], 0.5, cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_tv_batch_cr_solver_lanes_agree():
    # The cyclic-reduction large-n path shares its elimination across
    # lanes too (solver='cr' forced at small n to keep the test fast).
    rng = np.random.default_rng(4)
    S = np.cumsum(rng.standard_normal((2, 256)), axis=1)
    cfg = ADMMConfig(maxiters=800)
    out = tv_batch(S, 0.3, cfg, solver="cr")
    solo = totalvariation(S[0], 0.3, cfg, solver="cr")
    np.testing.assert_allclose(
        np.asarray(out.xopt[0]), np.asarray(solo.xopt), atol=1e-8
    )


def _rhs_instances(B=3, m=96, n=24, seed=5):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n))
    X = rng.standard_normal((B, n))
    S = X @ D.T + 0.05 * rng.standard_normal((B, m))
    S[:, ::10] += 3.0  # outliers — the robust losses' reason to exist
    return D, S


def test_lad_batch_matches_serial_per_rhs():
    D, S = _rhs_instances()
    cfg = ADMMConfig(maxiters=2000)
    out = lad_batch(D, S, cfg)
    for i in range(S.shape[0]):
        solo = lad(D, S[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_huberfit_batch_matches_serial_per_rhs():
    D, S = _rhs_instances(seed=6)
    cfg = ADMMConfig(maxiters=2000)
    out = huberfit_batch(D, S, cfg)
    for i in range(S.shape[0]):
        solo = huberfit(D, S[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )


def test_batch_composes_with_engine_variants():
    # Relaxation + unroll through the batched runner stays lane-exact.
    D, S = _rhs_instances(seed=7)
    cfg = ADMMConfig(maxiters=2000, relax=1.3, unroll=4)
    out = lad_batch(D, S, cfg)
    solo = lad(D, S[2], cfg)
    np.testing.assert_allclose(
        np.asarray(out.xopt[2]), np.asarray(solo.xopt), atol=1e-8
    )
    assert int(out.steps[2]) == solo.steps


def test_covsel_batch_matches_serial_per_covariance():
    from admm_tpu import covarianceselection, covsel_batch
    from admm_tpu.models.covarianceselection import empirical_covariance

    rng = np.random.default_rng(13)
    B, m, n = 3, 120, 24
    Ds = rng.standard_normal((B, m, n))
    Ss = np.stack([np.asarray(empirical_covariance(Ds[i])) for i in range(B)])
    cfg = ADMMConfig(maxiters=400)
    out = covsel_batch(Ss, 0.1, cfg)
    assert out.xopt.shape == (B, n, n)
    for i in range(B):
        solo = covarianceselection(Ds[i], 0.1, cfg, prox_method="ns")
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_covsel_batch_rejects_bad_shapes():
    rng = np.random.default_rng(14)
    with pytest.raises(ValueError, match="stack of covariance"):
        covsel_batch = __import__("admm_tpu").covsel_batch
        covsel_batch(rng.standard_normal((3, 8, 9)), 0.1)


def test_lasso_batch_sharded_matches_unsharded():
    # Lanes sharded over an 8-device mesh: GSPMD partitions the vmapped
    # program lane-wise; results must match the single-device run.
    from admm_tpu.parallel import make_mesh

    D, S = _lasso_instances(B=8)
    lam = 0.1 * np.max(np.abs(S @ D))
    cfg = ADMMConfig(maxiters=2000)
    plain = lasso_batch(D, S, lam, cfg)
    sharded = lasso_batch(D, S, lam, cfg, mesh=make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(sharded.xopt), np.asarray(plain.xopt), atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.steps), np.asarray(plain.steps)
    )


def test_tv_batch_sharded_matches_unsharded():
    from admm_tpu.parallel import make_mesh

    rng = np.random.default_rng(12)
    S = np.cumsum(rng.standard_normal((16, 96)), axis=1)
    cfg = ADMMConfig(maxiters=800)
    plain = tv_batch(S, 0.4, cfg)
    sharded = tv_batch(S, 0.4, cfg, mesh=make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(sharded.xopt), np.asarray(plain.xopt), atol=1e-12
    )


def test_batch_mesh_requires_divisible_batch():
    from admm_tpu.parallel import make_mesh

    D, S = _lasso_instances(B=3)
    with pytest.raises(ValueError, match="divide evenly"):
        lasso_batch(D, S, 0.1, ADMMConfig(maxiters=50), mesh=make_mesh(2))


def test_batch_runner_is_cached_across_calls():
    from admm_tpu.models.paths import _cached_path_runner

    D, S = _lasso_instances(B=2)
    lam = 0.1 * np.max(np.abs(S @ D))
    cfg = ADMMConfig(maxiters=200)
    lasso_batch(D, S, lam, cfg)
    before = _cached_path_runner.cache_info().hits
    lasso_batch(D, S + 0.01, lam, cfg)  # fresh data, same program
    assert _cached_path_runner.cache_info().hits == before + 1


def test_svm_batch_matches_serial_per_classifier():
    # One-vs-all: 3 classifiers differing only in their label vector
    # (the mnistsvm per-digit loop, reference examples/mnistsvm.m:121-156).
    from admm_tpu import linearsvm, svm_batch

    rng = np.random.default_rng(21)
    m, n = 120, 16
    D = rng.standard_normal((m, n))
    y = rng.integers(0, 3, size=m)
    ells = np.stack([np.where(y == k, 1.0, -1.0) for k in range(3)])
    cfg = ADMMConfig(maxiters=400)
    out = svm_batch(D, ells, 0.5, cfg, seed=3)
    assert out.xopt.shape == (3, n)
    for k in range(3):
        solo = linearsvm(D, ells[k], 0.5, cfg, seed=3)
        np.testing.assert_allclose(
            np.asarray(out.xopt[k]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[k]) == solo.steps


def test_svm_batch_per_lane_C_and_01_loss():
    from admm_tpu import linearsvm, svm_batch

    rng = np.random.default_rng(22)
    m, n = 80, 12
    D = rng.standard_normal((m, n))
    ells = np.sign(rng.standard_normal((2, m)))
    Cs = np.array([0.3, 2.0])
    cfg = ADMMConfig(maxiters=300)
    out = svm_batch(D, ells, Cs, cfg, loss="01", seed=5)
    for k in range(2):
        solo = linearsvm(D, ells[k], float(Cs[k]), cfg, loss="01", seed=5)
        np.testing.assert_allclose(
            np.asarray(out.xopt[k]), np.asarray(solo.xopt), atol=1e-8
        )


def test_svm_batch_rejects_bad_shapes():
    from admm_tpu import svm_batch

    rng = np.random.default_rng(23)
    with pytest.raises(ValueError, match="batch of row instances"):
        svm_batch(rng.standard_normal((40, 8)),
                  np.ones((2, 39)), 0.5, ADMMConfig(maxiters=10))


def _lp_instances(B=3, m=20, n=48, seed=31):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n))
    Xf = np.abs(rng.standard_normal((B, n)))  # feasible >= 0 points
    Ss = Xf @ D.T
    bs = np.abs(rng.standard_normal((B, n)))  # b >= 0 -> bounded LP
    return D, bs, Ss


def test_lp_batch_matches_serial_per_instance():
    from admm_tpu import linearprogram, lp_batch

    D, bs, Ss = _lp_instances()
    cfg = ADMMConfig(maxiters=500)
    out = lp_batch(bs, D, Ss, cfg)
    assert out.xopt.shape == (3, 48)
    for i in range(3):
        solo = linearprogram(bs[i], D, Ss[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_lp_batch_shared_cost_broadcasts():
    from admm_tpu import lp_batch

    D, bs, Ss = _lp_instances()
    out = lp_batch(bs[0], D, Ss, ADMMConfig(maxiters=50))
    assert out.xopt.shape == (3, 48)


def test_lp_batch_rejects_dynamic_rho_and_no_batch_axis():
    from admm_tpu import lp_batch

    D, bs, Ss = _lp_instances()
    with pytest.raises(ValueError, match="fixed rho"):
        lp_batch(bs, D, Ss, ADMMConfig(maxiters=50, adaptive=True))
    with pytest.raises(ValueError, match="leading batch axis"):
        lp_batch(bs[0], D, Ss[0], ADMMConfig(maxiters=50))


def test_qp_batch_standard_matches_serial():
    from admm_tpu import qp_batch, quadraticprogram

    rng = np.random.default_rng(33)
    B, m, n = 3, 12, 32
    R = rng.standard_normal((n, 2 * n))
    P = R @ R.T / (2 * n) + 0.1 * np.eye(n)
    D = rng.standard_normal((m, n))
    Ss = (np.abs(rng.standard_normal((B, n))) @ D.T)
    Qs = rng.standard_normal((B, n))
    cfg = ADMMConfig(maxiters=400)
    out = qp_batch(P, Qs, 0.0, D, Ss, cfg)
    for i in range(B):
        solo = quadraticprogram(P, Qs[i], 0.0, D, Ss[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_qp_batch_bounded_matches_serial():
    from admm_tpu import qp_batch, quadraticprogram

    rng = np.random.default_rng(34)
    B, n = 4, 24
    R = rng.standard_normal((n, 2 * n))
    P = R @ R.T / (2 * n) + 0.1 * np.eye(n)
    Qs = rng.standard_normal((B, n))
    lbs = -np.abs(rng.standard_normal((B, n)))
    ubs = np.abs(rng.standard_normal((B, n)))
    rs = rng.standard_normal(B)
    cfg = ADMMConfig(maxiters=400, objevals=True)
    out = qp_batch(P, Qs, rs, lbs, ubs, cfg, form="bounded")
    for i in range(B):
        solo = quadraticprogram(P, Qs[i], float(rs[i]), lbs[i], ubs[i],
                                cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        np.testing.assert_allclose(
            float(out.objopt[i]), float(solo.objopt), atol=1e-8
        )


def test_qp_batch_bounded_shared_bounds_auto_detects():
    # 1-D bounds select the bounded form without form=.
    from admm_tpu import qp_batch

    rng = np.random.default_rng(35)
    n = 16
    P = np.eye(n)
    out = qp_batch(P, rng.standard_normal((3, n)), 0.0,
                   -np.ones(n), np.ones(n), ADMMConfig(maxiters=100))
    assert out.xopt.shape == (3, n)
    # z is the box-projected iterate (exactly feasible by construction);
    # x only satisfies the bounds up to the primal residual.
    assert np.all(np.asarray(out.zopt) >= -1 - 1e-9)
    assert np.all(np.asarray(out.zopt) <= 1 + 1e-9)


def test_qp_batch_rejects_bad_form():
    from admm_tpu import qp_batch

    with pytest.raises(ValueError, match="form must be"):
        qp_batch(np.eye(4), np.zeros((2, 4)), 0.0, -np.ones(4), np.ones(4),
                 ADMMConfig(maxiters=10), form="bogus")


def test_batch_warm_start_from_own_solution_restarts_cheaply():
    # Receding-horizon pattern: re-solving from the previous solution
    # must converge almost immediately.
    from admm_tpu import qp_batch

    rng = np.random.default_rng(51)
    B, m, n = 3, 10, 24
    R = rng.standard_normal((n, 2 * n))
    P = R @ R.T / (2 * n) + 0.1 * np.eye(n)
    D = rng.standard_normal((m, n))
    Ss = np.abs(rng.standard_normal((B, n))) @ D.T
    Qs = rng.standard_normal((B, n))
    cfg = ADMMConfig(maxiters=500)
    cold = qp_batch(P, Qs, 0.0, D, Ss, cfg)
    warm = qp_batch(P, Qs, 0.0, D, Ss, cfg,
                    x0=cold.xopt, z0=cold.zopt, u0=cold.uopt)
    assert np.all(np.asarray(warm.steps) <= 3)
    # The warm solve runs a few more iterations before its own stop
    # triggers, so it drifts from the cold fixed point by O(tolerance).
    np.testing.assert_allclose(
        np.asarray(warm.xopt), np.asarray(cold.xopt), atol=1e-3
    )


def test_batch_warm_start_matches_serial_warm_start():
    from admm_tpu import lasso, lasso_batch

    D, S = _lasso_instances(B=2)
    lam = 0.1 * np.max(np.abs(S @ D))
    rng = np.random.default_rng(52)
    X0 = rng.standard_normal((2, 96))
    cfg = ADMMConfig(maxiters=300)
    out = lasso_batch(D, S, lam, cfg, x0=X0, z0=X0, u0=0.1 * X0)
    for i in range(2):
        solo = lasso(D, S[i], float(lam), cfg,
                     x0=X0[i], z0=X0[i], u0=0.1 * X0[i])
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_batch_warm_start_broadcasts_single_instance():
    from admm_tpu import lasso_batch

    D, S = _lasso_instances(B=3)
    x0 = np.zeros(96) + 0.5
    out = lasso_batch(D, S, 0.5, ADMMConfig(maxiters=50), x0=x0)
    assert out.xopt.shape == (3, 96)


def test_model_batch_matches_serial_per_rhs_pair():
    from admm_tpu import model, model_batch

    rng = np.random.default_rng(55)
    B, mP, mQ, n = 3, 40, 32, 20
    P = rng.standard_normal((mP, n))
    Q = rng.standard_normal((mQ, n))
    Rs = rng.standard_normal((B, mP))
    Ss = rng.standard_normal((B, mQ))
    cfg = ADMMConfig(maxiters=2000)
    out = model_batch(P, Q, Rs, Ss, cfg)
    assert out.xopt.shape == (B, n)
    for i in range(B):
        solo = model(P, Q, Rs[i], Ss[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_model_batch_shared_s_broadcasts():
    from admm_tpu import model_batch

    rng = np.random.default_rng(56)
    P = rng.standard_normal((20, 10))
    Q = rng.standard_normal((16, 10))
    out = model_batch(P, Q, rng.standard_normal((2, 20)),
                      rng.standard_normal(16), ADMMConfig(maxiters=100))
    assert out.xopt.shape == (2, 10)


def test_tv2d_batch_matches_serial_per_image():
    from admm_tpu import totalvariation2d, tv2d_batch

    rng = np.random.default_rng(57)
    B, m, n = 3, 12, 16
    blocks = rng.standard_normal((B, 3, 4))
    Ss = np.kron(blocks, np.ones((4, 4))) + 0.1 * rng.standard_normal((B, m, n))
    cfg = ADMMConfig(maxiters=600)
    out = tv2d_batch(Ss, 0.4, cfg)
    assert out.xopt.shape == (B, m, n)
    for i in range(B):
        solo = totalvariation2d(Ss[i], 0.4, cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_tv2d_batch_per_lane_lambda_and_shape_check():
    from admm_tpu import tv2d_batch

    rng = np.random.default_rng(58)
    Ss = rng.standard_normal((2, 8, 8))
    out = tv2d_batch(Ss, np.array([0.1, 5.0]), ADMMConfig(maxiters=300))
    # a huge lambda flattens the image much more than a tiny one
    tv = lambda X: np.abs(np.diff(X, axis=0)).sum() + np.abs(np.diff(X, axis=1)).sum()
    assert tv(np.asarray(out.xopt[1])) < 0.1 * tv(np.asarray(out.xopt[0]))
    with pytest.raises(ValueError, match="stack of images"):
        tv2d_batch(Ss[0], 0.1)


def test_qp_batch_bound_stacks_auto_detect_bounded():
    # Shape-matched 2-D (lb, ub) stacks must NOT be read as an equality
    # system (which would silently solve the wrong problem when B == n).
    from admm_tpu import qp_batch

    rng = np.random.default_rng(71)
    B = n = 12  # the degenerate square case
    P = np.eye(n)
    Qs = rng.standard_normal((B, n))
    lbs = -np.abs(rng.standard_normal((B, n)))
    ubs = np.abs(rng.standard_normal((B, n)))
    out = qp_batch(P, Qs, 0.0, lbs, ubs, ADMMConfig(maxiters=200))
    z = np.asarray(out.zopt)
    assert np.all(z >= lbs - 1e-9) and np.all(z <= ubs + 1e-9)


def test_qp_batch_mixed_bound_shapes_error_mentions_bounded():
    from admm_tpu import qp_batch

    rng = np.random.default_rng(72)
    B, n = 5, 12
    P = np.eye(n)
    with pytest.raises(ValueError, match="form='bounded'"):
        # 2-D lb + shared 1-D ub misdetects as standard; the error must
        # point at the escape hatch.
        qp_batch(P, rng.standard_normal((B, n)), 0.0,
                 -np.abs(rng.standard_normal((B, n))), np.ones(n),
                 ADMMConfig(maxiters=10))


def test_qp_structure_reuse_matches_fresh_fold():
    from admm_tpu import qp_batch, qp_structure

    rng = np.random.default_rng(73)
    B, m, n = 3, 8, 20
    R = rng.standard_normal((n, 2 * n))
    P = R @ R.T / (2 * n) + 0.1 * np.eye(n)
    D = rng.standard_normal((m, n))
    Ss = np.abs(rng.standard_normal((B, n))) @ D.T
    Qs = rng.standard_normal((B, n))
    cfg = ADMMConfig(maxiters=300)
    fresh = qp_batch(P, Qs, 0.0, D, Ss, cfg)
    struct = qp_structure(P, D)
    reused = qp_batch(P, Qs, 0.0, D, Ss, cfg, structure=struct)
    np.testing.assert_array_equal(np.asarray(reused.xopt),
                                  np.asarray(fresh.xopt))
    # bounded-form structure
    sb = qp_structure(P)
    lb, ub = -np.ones(n), np.ones(n)
    fb = qp_batch(P, Qs, 0.0, lb, ub, cfg)
    rb = qp_batch(P, Qs, 0.0, lb, ub, cfg, structure=sb)
    np.testing.assert_array_equal(np.asarray(rb.xopt), np.asarray(fb.xopt))
    with pytest.raises(ValueError, match="rho"):
        qp_batch(P, Qs, 0.0, D, Ss, ADMMConfig(maxiters=10, rho=2.0),
                 structure=struct)
    with pytest.raises(ValueError, match="conflicts"):
        qp_batch(P, Qs, 0.0, lb, ub, cfg, structure=struct, form="bounded")


def test_svm_batch_forces_driver_stopping_like_serial():
    # The serial chain overwrites caller stopcond/nodualerror with the
    # reference driver's values (unwrappedadmm.m:90-92); the batch path
    # must match or lanes stop differently from solo runs.
    from admm_tpu import linearsvm, svm_batch

    rng = np.random.default_rng(74)
    m, n = 60, 10
    D = rng.standard_normal((m, n))
    ells = np.sign(rng.standard_normal((2, m)))
    cfg = ADMMConfig(maxiters=200)
    out = svm_batch(D, ells, 0.5, cfg, seed=2, stopcond="standard",
                    nodualerror=False)
    for k in range(2):
        solo = linearsvm(D, ells[k], 0.5, cfg, seed=2,
                         stopcond="standard", nodualerror=False)
        np.testing.assert_allclose(
            np.asarray(out.xopt[k]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[k]) == solo.steps


def test_batch_composes_with_adaptive_rho():
    # Per-lane adaptive rho under vmap: the rho-parameterized solver
    # (SymShiftSolver/FatShiftSolver eigh basis) is shared while each
    # lane walks its own rho trajectory — must match serial exactly.
    D, S = _lasso_instances(B=3, seed=91)
    lam = 0.1 * np.max(np.abs(S @ D))
    cfg = ADMMConfig(maxiters=2000, adaptive=True, convtest=True)
    out = lasso_batch(D, S, lam, cfg)
    for i in range(3):
        solo = lasso(D, S[i], float(lam), cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-5
        )
        assert int(out.steps[i]) == solo.steps


@pytest.mark.parametrize("opts", [
    dict(fast=True, fasttype="strong"),
    dict(fast=True, fasttype="weak", maxiters=400),
    dict(relax=1.5),
    dict(relax=0.8, unroll=4),
    dict(adaptive=True, convtest=True),
    dict(fast=True, fasttype="strong", unroll=4),
    dict(stopcond="hnorm"),
    dict(stopcond="both", unroll=2),
])
def test_batch_engine_variant_matrix_matches_serial(opts):
    # Every engine variant combination must produce bit-comparable
    # trajectories through the vmapped runner — the batch-vs-serial
    # equality is the oracle for variant/batching interplay.
    D, S = _lasso_instances(B=2, seed=101)
    lam = 0.15 * np.max(np.abs(S @ D))
    cfg = ADMMConfig(**{"maxiters": 800, **opts})
    out = lasso_batch(D, S, lam, cfg)
    for i in range(2):
        solo = lasso(D, S[i], float(lam), cfg)
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_batch_warm_start_composes_with_fast_mode():
    # Accelerated modes seed their momentum state (v, uhat) from the
    # warm-started z0/u0 (engine.py:434, reference admm.m:264-298).
    D, S = _lasso_instances(B=2, seed=102)
    lam = 0.15 * np.max(np.abs(S @ D))
    rng = np.random.default_rng(103)
    X0 = rng.standard_normal(S.shape[0] * 96).reshape(2, 96)
    cfg = ADMMConfig(maxiters=600, fast=True, fasttype="strong")
    out = lasso_batch(D, S, lam, cfg, x0=X0, z0=X0, u0=0.0 * X0)
    for i in range(2):
        solo = lasso(D, S[i], float(lam), cfg,
                     x0=X0[i], z0=X0[i], u0=0.0 * X0[i])
        np.testing.assert_allclose(
            np.asarray(out.xopt[i]), np.asarray(solo.xopt), atol=1e-8
        )
        assert int(out.steps[i]) == solo.steps


def test_batch_stall_flags_per_lane():
    """ADMMConfig.stallwindow under the vmapped batch runner: per-lane
    plateau flags surface in BatchResults.extra['stalled']."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.models.batch import basispursuit_batch

    rng = np.random.default_rng(2)
    m, n, B = 24, 96, 3
    D = rng.standard_normal((m, n)).astype(np.float32)
    X = (rng.standard_normal((B, n)) * (rng.random((B, n)) < 0.1))
    S = (X @ D.T).astype(np.float32)
    res = basispursuit_batch(
        D, S, ADMMConfig(maxiters=3000, abstol=1e-12, reltol=1e-11,
                         stallwindow=60))
    st = np.asarray(res.extra["stalled"])
    steps = np.asarray(res.steps)
    assert st.shape == (B,) and st.all()
    assert (steps < 3000).all()
