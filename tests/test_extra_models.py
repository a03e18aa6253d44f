"""Beyond-reference model families: elastic net, group lasso, NNLS.

Oracle strategy mirrors the reference testers (SURVEY.md §4): seeded
random instances with a constructible truth.  Where no closed form
exists the optimizer's KKT/subgradient conditions are asserted directly
— a stronger check than objective comparison.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu import ADMMConfig, elasticnet, grouplasso, lasso, nnls
from admm_tpu.models import get_prox_ops
from admm_tpu.models.grouplasso import resolve_groups

_CFG = ADMMConfig(maxiters=20000, abstol=1e-12, reltol=1e-12)


def _instance(rng, m=60, n=30, sparsity=0.4):
    D = rng.standard_normal((m, n))
    xtrue = rng.standard_normal(n) * (rng.random(n) < sparsity)
    s = D @ xtrue + 0.05 * rng.standard_normal(m)
    return D, s


class TestElasticNet:
    def test_alpha_zero_is_ridge_closed_form(self, rng):
        D, s = _instance(rng)
        lam = 0.8
        res = elasticnet(D, s, lam, alpha=0.0, config=_CFG)
        xstar = np.linalg.solve(D.T @ D + lam * np.eye(D.shape[1]), D.T @ s)
        np.testing.assert_allclose(np.asarray(res.zopt), xstar, atol=1e-8)

    def test_alpha_one_matches_lasso(self, rng):
        D, s = _instance(rng)
        lam = 0.5
        r_en = elasticnet(D, s, lam, alpha=1.0, config=_CFG)
        r_la = lasso(D, s, lam, _CFG)
        np.testing.assert_allclose(np.asarray(r_en.zopt),
                                   np.asarray(r_la.zopt), atol=1e-10)

    def test_kkt_conditions_general_alpha(self, rng):
        D, s = _instance(rng)
        lam, alpha = 0.7, 0.6
        z = np.asarray(elasticnet(D, s, lam, alpha, config=_CFG).zopt)
        g = D.T @ (D @ z - s) + lam * (1 - alpha) * z
        active = np.abs(z) > 1e-9
        # Stationarity on the support, subgradient bound off it.
        np.testing.assert_allclose(g[active], -lam * alpha * np.sign(z[active]),
                                   atol=1e-6)
        assert np.all(np.abs(g[~active]) <= lam * alpha + 1e-6)

    def test_fat_matrix_path(self, rng):
        # m < n exercises the shared Woodbury/stream x-prox.
        D, s = _instance(rng, m=24, n=64)
        lam, alpha = 0.4, 0.5
        z = np.asarray(elasticnet(D, s, lam, alpha, config=_CFG).zopt)
        g = D.T @ (D @ z - s) + lam * (1 - alpha) * z
        active = np.abs(z) > 1e-9
        np.testing.assert_allclose(g[active], -lam * alpha * np.sign(z[active]),
                                   atol=1e-6)
        assert np.all(np.abs(g[~active]) <= lam * alpha + 1e-6)

    def test_validates_alpha(self, rng):
        D, s = _instance(rng)
        with pytest.raises(ValueError, match="alpha"):
            elasticnet(D, s, 0.5, alpha=1.5)


class TestGroupLasso:
    def test_kkt_conditions_uneven_groups(self, rng):
        # Group-sparse planted truth: groups 1 and 4 identically zero;
        # the solver must recover that support and satisfy the KKT
        # conditions group-by-group.
        m, n = 80, 30
        lengths = [7, 3, 10, 5, 5]
        D = rng.standard_normal((m, n))
        xtrue = rng.standard_normal(n)
        xtrue[7:10] = 0.0
        xtrue[25:30] = 0.0
        s = D @ xtrue + 0.05 * rng.standard_normal(m)
        lam = 2.0
        res = grouplasso(D, s, lam, lengths, config=_CFG)
        z = np.asarray(res.zopt)
        g = D.T @ (D @ z - s)
        norms = []
        start = 0
        for L in lengths:
            sl = slice(start, start + L)
            nz = np.linalg.norm(z[sl])
            norms.append(nz)
            if nz > 1e-8:
                np.testing.assert_allclose(g[sl], -lam * z[sl] / nz, atol=1e-6)
            else:
                assert np.linalg.norm(g[sl]) <= lam + 1e-6
            start += L
        # The planted-zero groups must come back exactly zero, the
        # active ones nonzero.
        assert norms[1] == 0.0 and norms[4] == 0.0
        assert norms[0] > 1 and norms[2] > 1

    def test_singleton_groups_match_lasso(self, rng):
        D, s = _instance(rng)
        n = D.shape[1]
        lam = 0.5
        r_gl = grouplasso(D, s, lam, np.arange(n), config=_CFG)
        r_la = lasso(D, s, lam, _CFG)
        np.testing.assert_allclose(np.asarray(r_gl.zopt),
                                   np.asarray(r_la.zopt), atol=1e-8)

    def test_lengths_and_ids_specs_agree(self, rng):
        D, s = _instance(rng, n=30)
        lam = 1.0
        lengths = [12, 8, 10]
        ids = np.repeat([0, 1, 2], lengths)
        r1 = grouplasso(D, s, lam, lengths, config=_CFG)
        r2 = grouplasso(D, s, lam, ids, config=_CFG)
        np.testing.assert_allclose(np.asarray(r1.zopt), np.asarray(r2.zopt),
                                   rtol=0, atol=0)

    def test_weights_scale_the_penalty(self, rng):
        # doubled weights at halved lam = identical problem.
        D, s = _instance(rng, n=30)
        r1 = grouplasso(D, s, 1.0, 5, weights=np.full(5, 2.0), config=_CFG)
        r2 = grouplasso(D, s, 2.0, 5, config=_CFG)
        np.testing.assert_allclose(np.asarray(r1.zopt), np.asarray(r2.zopt),
                                   atol=1e-10)

    def test_resolve_groups_validation(self):
        with pytest.raises(ValueError, match="tile"):
            resolve_groups(7, 30)
        with pytest.raises(ValueError, match="sum to"):
            resolve_groups([10, 10], 30)
        with pytest.raises(ValueError, match="contiguously"):
            resolve_groups(np.r_[np.zeros(15, int), np.full(15, 2)], 30)
        gid, num = resolve_groups([10, 20], 30)
        assert num == 2 and int(gid[9]) == 0 and int(gid[10]) == 1

    def test_resolve_groups_lengths_vs_ids_ambiguity(self):
        # np.ones(n) is the natural spelling of n singleton groups via
        # lengths, but a length-n vector is read as ids — the error must
        # name the ambiguity, not just say "contiguously" (ADVICE r2).
        with pytest.raises(ValueError, match="LENGTHS"):
            resolve_groups(np.ones(12, int), 12)
        # A length-n vector of ids that sums to n by coincidence but IS a
        # valid id cover must still resolve as ids.
        gid, num = resolve_groups(np.r_[np.zeros(6, int), np.ones(6, int)], 12)
        assert num == 2


class TestNNLS:
    def test_matches_scipy(self, rng):
        from scipy.optimize import nnls as scipy_nnls

        D, s = _instance(rng, m=60, n=25)
        z = np.asarray(nnls(D, s, config=_CFG).zopt)
        xs, _ = scipy_nnls(D, s)
        np.testing.assert_allclose(z, xs, atol=1e-6)
        assert np.all(z >= 0)

    def test_kkt_fat_matrix(self, rng):
        # Underdetermined (m < n): scipy's active-set nnls struggles, the
        # KKT conditions still characterize a solution. g_i >= 0 where
        # z_i = 0, g_i ~ 0 where z_i > 0.
        D, s = _instance(rng, m=20, n=50)
        z = np.asarray(nnls(D, s, config=_CFG).zopt)
        g = D.T @ (D @ z - s)
        assert np.all(z >= 0)
        assert np.all(np.abs(g[z > 1e-8]) <= 1e-6)
        assert np.all(g[z <= 1e-8] >= -1e-6)


class TestBatchVariants:
    """Each lane of the batched solver must match its serial solve
    exactly (same trajectory, same step count) — the batch-layer
    contract (models/batch.py)."""

    def test_elasticnet_batch_matches_serial(self, rng):
        from admm_tpu import elasticnet_batch

        D, _ = _instance(rng, m=40, n=24)
        S = rng.standard_normal((3, 40))
        lams = np.array([0.3, 0.6, 0.9])
        alphas = np.array([0.2, 0.5, 1.0])
        cfg = ADMMConfig(maxiters=3000)
        out = elasticnet_batch(D, S, lams, alphas, cfg)
        for i in range(3):
            solo = elasticnet(D, S[i], float(lams[i]), float(alphas[i]),
                              config=cfg)
            np.testing.assert_allclose(np.asarray(out.xopt[i]),
                                       np.asarray(solo.xopt), atol=1e-8)
            assert int(out.steps[i]) == solo.steps

    def test_grouplasso_batch_matches_serial(self, rng):
        from admm_tpu import grouplasso_batch

        D, _ = _instance(rng, m=40, n=24)
        S = rng.standard_normal((2, 40))
        lengths = [10, 6, 8]
        cfg = ADMMConfig(maxiters=3000)
        out = grouplasso_batch(D, S, 0.8, lengths, config=cfg)
        for i in range(2):
            solo = grouplasso(D, S[i], 0.8, lengths, config=cfg)
            np.testing.assert_allclose(np.asarray(out.xopt[i]),
                                       np.asarray(solo.xopt), atol=1e-8)
            assert int(out.steps[i]) == solo.steps

    def test_nnls_batch_matches_serial(self, rng):
        from admm_tpu import nnls_batch

        D, _ = _instance(rng, m=40, n=24)
        S = rng.standard_normal((3, 40))
        cfg = ADMMConfig(maxiters=5000)
        out = nnls_batch(D, S, cfg)
        for i in range(3):
            solo = nnls(D, S[i], config=cfg)
            np.testing.assert_allclose(np.asarray(out.zopt[i]),
                                       np.asarray(solo.zopt), atol=1e-8)
            assert int(out.steps[i]) == solo.steps
        assert np.all(np.asarray(out.zopt) >= 0)

    def test_elasticnet_batch_validates_alpha(self, rng):
        from admm_tpu import elasticnet_batch

        D, _ = _instance(rng, m=40, n=24)
        S = rng.standard_normal((2, 40))
        with pytest.raises(ValueError, match="alpha"):
            elasticnet_batch(D, S, 0.5, np.array([0.5, 1.5]))


def test_registry_entries(rng):
    D, s = _instance(rng, n=20)
    for key, kwargs in [("elasticnet", dict(lam=0.5, alpha=0.5)),
                        ("grouplasso", dict(lam=0.5, groups=4)),
                        ("nnls", {})]:
        pf, pg, obj = get_prox_ops(key, D=D, s=s, **kwargs)
        x = pf(jnp.zeros(20), jnp.zeros(20), jnp.zeros(20), 1.0)
        z = pg(x, jnp.zeros(20), jnp.zeros(20), 1.0)
        assert np.all(np.isfinite(np.asarray(z)))
        assert np.isfinite(float(obj(x, z)))


class TestQuantileRegression:
    """Quantile regression (models/quantile.py): pinball loss via the
    asymmetric soft-threshold prox.  QR is an LP, so scipy linprog is an
    exact oracle."""

    def _lp_oracle(self, D, s, tau):
        # min tau 1'p + (1-tau) 1'q  s.t.  Dx - s = p - q, p,q >= 0
        from scipy.optimize import linprog

        m, n = D.shape
        cvec = np.r_[np.zeros(n), tau * np.ones(m), (1 - tau) * np.ones(m)]
        A_eq = np.c_[D, -np.eye(m), np.eye(m)]
        bounds = [(None, None)] * n + [(0, None)] * (2 * m)
        out = linprog(cvec, A_eq=A_eq, b_eq=s, bounds=bounds, method="highs")
        assert out.status == 0
        return out.fun, out.x[:n]

    @pytest.mark.parametrize("tau", [0.2, 0.5, 0.8])
    def test_objective_matches_lp_oracle(self, rng, tau):
        from admm_tpu import quantile

        D, s = _instance(rng, m=80, n=12)
        res = quantile(D, s, tau, _CFG, objevals=True)
        f_lp, _ = self._lp_oracle(D, s, tau)
        r = np.asarray(D @ np.asarray(res.xopt) - s)
        f_admm = float(np.sum(np.maximum(tau * r, (tau - 1) * r)))
        # No steps assertion: on this nonsmooth LP the iterates reach
        # ~1e-6 relative objective then stall (standard ADMM tail
        # behavior on LPs); the Boyd 1e-12 stop may never fire.
        np.testing.assert_allclose(f_admm, f_lp, rtol=1e-5, atol=1e-9)

    def test_tau_half_matches_lad(self, rng):
        from admm_tpu import quantile
        from admm_tpu.models.lad import lad

        D, s = _instance(rng, m=100, n=10)
        q = quantile(D, s, 0.5, _CFG)
        l = lad(D, s, _CFG)
        # Same minimizer (pinball_0.5 = 0.5 |.|); iterates differ, the
        # limit must not.
        np.testing.assert_allclose(np.asarray(q.xopt), np.asarray(l.xopt),
                                   rtol=0, atol=2e-6)

    def test_empirical_quantile_property(self, rng):
        # At the optimum roughly (1 - tau) of the residuals Dx - s are
        # positive (the pinball subgradient balance).
        from admm_tpu import quantile

        D = np.c_[np.ones(2000), rng.standard_normal((2000, 3))]
        s = D @ np.array([1.0, 2.0, -1.0, 0.5]) + rng.standard_normal(2000)
        for tau in (0.2, 0.8):
            res = quantile(D, s, tau, ADMMConfig(maxiters=20000,
                                                 abstol=1e-10, reltol=1e-10))
            r = np.asarray(D @ np.asarray(res.xopt) - s)
            frac_pos = float(np.mean(r > 0))
            assert abs(frac_pos - (1 - tau)) < 0.04, (tau, frac_pos)

    def test_validation(self, rng):
        from admm_tpu import quantile

        D, s = _instance(rng)
        with pytest.raises(ValueError, match="tau"):
            quantile(D, s, 0.0, _CFG)
        with pytest.raises(ValueError, match="tau"):
            quantile(D, s, 1.2, _CFG)

    def test_relaxed_path(self, rng):
        from admm_tpu import quantile

        D, s = _instance(rng, m=80, n=12)
        base = quantile(D, s, 0.3, _CFG)
        rel = quantile(D, s, 0.3, _CFG, relax=1.5)
        f = lambda x: float(np.sum(np.maximum(
            0.3 * (D @ x - s), -0.7 * (D @ x - s))))
        np.testing.assert_allclose(f(np.asarray(rel.xopt)),
                                   f(np.asarray(base.xopt)), rtol=1e-6)

    def test_batch_per_lane_taus_match_solo(self, rng):
        from admm_tpu import quantile, quantile_batch

        D, s = _instance(rng, m=80, n=12)
        taus = np.array([0.2, 0.5, 0.8])
        cfg = ADMMConfig(maxiters=8000, abstol=1e-11, reltol=1e-11)
        out = quantile_batch(D, s, taus, config=cfg)
        for i, tau in enumerate(taus):
            solo = quantile(D, s, float(tau), cfg)
            np.testing.assert_allclose(np.asarray(out.xopt[i]),
                                       np.asarray(solo.xopt),
                                       rtol=1e-8, atol=1e-10)

    def test_registry_entry(self, rng):
        D, s = _instance(rng, m=40, n=8)
        pf, pg, obj = get_prox_ops("quantile", D=D, s=s, tau=0.3)
        assert pf is not None and pg is not None and obj is not None


class TestRobustPCA:
    """Principal component pursuit (models/rpca.py): exact-recovery
    oracle per Candes et al. 2011 — plant incoherent low-rank + random
    sparse, recover both to high precision at the theory lam."""

    def _plant(self, rng, m=60, n=50, r=3, frac=0.05, amp=5.0):
        L0 = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
        S0 = (rng.random((m, n)) < frac) * (amp * rng.standard_normal((m, n)))
        return L0, S0

    def test_exact_recovery(self, rng):
        from admm_tpu import rpca

        L0, S0 = self._plant(rng)
        res = rpca(L0 + S0, config=ADMMConfig(maxiters=3000, abstol=1e-10,
                                              reltol=1e-10))
        L, S = np.asarray(res.xopt), np.asarray(res.zopt)
        assert res.steps < 3000 and not res.diverged
        assert np.linalg.norm(L - L0) <= 1e-6 * np.linalg.norm(L0)
        assert np.linalg.norm(S - S0) <= 1e-6 * np.linalg.norm(S0)
        assert np.linalg.matrix_rank(L, tol=1e-5) == 3
        # The split reproduces M to the stopping tolerance.
        np.testing.assert_allclose(L + S, L0 + S0, atol=1e-6)

    def test_objective_beats_truth_perturbation(self, rng):
        # Objective oracle in the reference testers' style: the ADMM
        # split must not be beaten by the planted split (it IS the
        # minimizer under exact recovery) nor by a perturbed one.
        from admm_tpu import rpca
        from admm_tpu.models.rpca import _obj

        import jax.numpy as jnp

        L0, S0 = self._plant(rng)
        M = L0 + S0
        lam = 1.0 / np.sqrt(max(M.shape))
        res = rpca(M, config=ADMMConfig(maxiters=3000, abstol=1e-10,
                                        reltol=1e-10))
        d = {"lam": jnp.asarray(lam)}
        f_admm = float(_obj(jnp.asarray(res.xopt), jnp.asarray(res.zopt), d))
        f_plant = float(_obj(jnp.asarray(L0), jnp.asarray(S0), d))
        assert f_admm <= f_plant * (1 + 1e-6)

    def test_rectangular_and_validation(self, rng):
        from admm_tpu import rpca

        with pytest.raises(ValueError, match="matrix"):
            rpca(np.ones(5))
        # Tall orientation exercises the non-square SVD path.
        L0, S0 = self._plant(rng, m=50, n=30, r=2)
        res = rpca(L0 + S0, config=ADMMConfig(maxiters=3000, abstol=1e-9,
                                              reltol=1e-9))
        assert np.linalg.norm(np.asarray(res.xopt) - L0) <= 1e-5 * np.linalg.norm(L0)


    def test_rsvd_prox_matches_exact(self, rng):
        # Randomized-range SVT at rank >= rank(L): same recovery as the
        # full-SVD prox (matmul-only range finding, small-sketch svd).
        from admm_tpu import rpca

        L0, S0 = self._plant(rng, m=72, n=60, r=3)
        cfg = ADMMConfig(maxiters=3000, abstol=1e-9, reltol=1e-9)
        exact = rpca(L0 + S0, config=cfg)
        rs = rpca(L0 + S0, config=cfg, prox_method="rsvd", rank=6)
        np.testing.assert_allclose(np.asarray(rs.xopt),
                                   np.asarray(exact.xopt), atol=1e-6)
        assert (np.linalg.norm(np.asarray(rs.xopt) - L0)
                <= 1e-6 * np.linalg.norm(L0))
        with pytest.raises(ValueError, match="rank"):
            rpca(L0 + S0, prox_method="rsvd")
        with pytest.raises(ValueError, match="prox_method"):
            rpca(L0 + S0, prox_method="power")

    def test_batch_rsvd_matches_serial_rsvd(self, rng):
        from admm_tpu import rpca, rpca_batch

        Ms = []
        for _ in range(2):
            L0, S0 = self._plant(rng, m=40, n=32, r=2)
            Ms.append(L0 + S0)
        Ms = np.stack(Ms)
        cfg = ADMMConfig(maxiters=2000, abstol=1e-9, reltol=1e-9)
        out = rpca_batch(Ms, config=cfg, prox_method="rsvd", rank=5)
        for i in range(2):
            solo = rpca(Ms[i], config=cfg, prox_method="rsvd", rank=5)
            assert int(out.steps[i]) == solo.steps
            np.testing.assert_allclose(np.asarray(out.xopt[i]),
                                       np.asarray(solo.xopt),
                                       rtol=1e-9, atol=1e-11)

    def test_registry(self, rng):
        L0, S0 = self._plant(rng, m=20, n=16, r=2)
        pf, pg, obj = get_prox_ops("rpca", M=L0 + S0)
        assert callable(pf) and callable(pg) and callable(obj)

    def test_rpca_batch_matches_serial(self, rng):
        from admm_tpu import rpca, rpca_batch

        Ms, L0s = [], []
        for _ in range(3):
            L0, S0 = self._plant(rng, m=24, n=20, r=2)
            Ms.append(L0 + S0)
            L0s.append(L0)
        Ms = np.stack(Ms)
        cfg = ADMMConfig(maxiters=2000, abstol=1e-9, reltol=1e-9)
        out = rpca_batch(Ms, config=cfg)
        for i in range(3):
            solo = rpca(Ms[i], config=cfg)
            assert int(out.steps[i]) == solo.steps
            np.testing.assert_allclose(np.asarray(out.xopt[i]),
                                       np.asarray(solo.xopt),
                                       rtol=1e-9, atol=1e-11)
            # Reconstruction to the stopping tolerance.  (Exact L0
            # recovery is NOT asserted here: 24x20 at rank 2 sits below
            # the PCP recovery regime — the full-scale oracle is
            # test_exact_recovery.)
            np.testing.assert_allclose(
                np.asarray(out.xopt[i]) + np.asarray(out.zopt[i]),
                Ms[i], atol=1e-5)


class TestFusedLasso:
    """Fused lasso (models/fusedlasso.py): stacked-constraint splitting
    with exact degenerate-case oracles — lam2=0 is elementwise
    soft-thresholding (closed form), lam1=0 is the TV denoiser."""

    def _signal(self, rng, n=200):
        stair = np.repeat(rng.standard_normal(n // 20), 20)
        return stair + 0.3 * rng.standard_normal(n)

    def test_lam2_zero_is_soft_threshold_closed_form(self, rng):
        from admm_tpu import fusedlasso
        from admm_tpu.ops.prox import soft_threshold

        s = self._signal(rng)
        r = fusedlasso(s, 0.4, 0.0, _CFG)
        np.testing.assert_allclose(np.asarray(r.xopt),
                                   np.asarray(soft_threshold(s, 0.4)),
                                   atol=1e-8)

    def test_lam1_zero_matches_tv(self, rng):
        from admm_tpu import fusedlasso
        from admm_tpu.models.totalvariation import totalvariation

        s = self._signal(rng)
        r = fusedlasso(s, 0.0, 0.6, _CFG)
        tv = totalvariation(s, 0.6, _CFG, solver="dense")
        np.testing.assert_allclose(np.asarray(r.xopt), np.asarray(tv.xopt),
                                   atol=1e-7)

    def test_general_case_structure_and_relax(self, rng):
        from admm_tpu import fusedlasso

        s = self._signal(rng)
        r = fusedlasso(s, 0.15, 0.6, _CFG)
        x = np.asarray(r.xopt)
        n = len(s)
        # Both structure types must be present: exact zeros (l1) and
        # far fewer distinct levels than samples (fused penalty).
        assert np.sum(np.abs(x) < 1e-6) > n // 10
        assert len(np.unique(np.round(x, 5))) < n // 4
        # Relaxation reaches the same minimizer.
        r2 = fusedlasso(s, 0.15, 0.6, _CFG, relax=1.5)
        np.testing.assert_allclose(np.asarray(r2.xopt), x, atol=1e-8)

    def test_objective_subgradient_optimality(self, rng):
        # 0 must lie in (x - s) + lam1 d||x||_1 + lam2 D^T d||Dx||_1:
        # check via the stacked dual u* = (1/rho) scaled multipliers —
        # |rho*u| <= t elementwise with equality on active rows.
        from admm_tpu import fusedlasso

        s = self._signal(rng, n=120)
        lam1, lam2, rho = 0.2, 0.5, 1.0
        r = fusedlasso(s, lam1, lam2, _CFG, rho=rho)
        u = np.asarray(r.uopt)
        n = len(s)
        t = np.r_[np.full(n, lam1), np.full(n, lam2)]
        assert np.all(rho * np.abs(u) <= t + 1e-6)

    def test_registry(self, rng):
        s = self._signal(rng, n=60)
        pf, pg, obj = get_prox_ops("fusedlasso", s=s, lam1=0.2, lam2=0.4)
        assert callable(pf) and callable(pg) and callable(obj)

    def test_batch_matches_serial(self, rng):
        from admm_tpu import fusedlasso, fusedlasso_batch

        n = 80
        S = np.stack([self._signal(rng, n) for _ in range(3)])
        l1s = np.array([0.1, 0.3, 0.0])
        l2s = np.array([0.5, 0.2, 0.7])
        cfg = ADMMConfig(maxiters=6000, abstol=1e-10, reltol=1e-10)
        out = fusedlasso_batch(S, l1s, l2s, config=cfg)
        for i in range(3):
            solo = fusedlasso(S[i], float(l1s[i]), float(l2s[i]), cfg)
            assert int(out.steps[i]) == solo.steps
            np.testing.assert_allclose(np.asarray(out.xopt[i]),
                                       np.asarray(solo.xopt),
                                       rtol=1e-9, atol=1e-11)
