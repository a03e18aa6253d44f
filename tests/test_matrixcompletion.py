"""Nuclear-norm matrix completion oracle tests.

Oracle strategy (SURVEY.md §4 pattern): plant an incoherent low-rank
matrix, observe a random entry subset well above the information
threshold, and assert the solver recovers the full matrix — the
standard exact-recovery property (Candes & Recht 2009).  The rsvd prox
and the batched solver are asserted against the exact-SVT path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu import ADMMConfig, matrixcompletion, matrixcompletion_batch
from admm_tpu.models import get_prox_ops

_CFG = ADMMConfig(maxiters=4000, abstol=1e-10, reltol=1e-8)


def _planted(rng, m=36, n=28, r=2, p=0.7):
    A = rng.standard_normal((m, r))
    B = rng.standard_normal((n, r))
    M0 = A @ B.T
    mask = rng.random((m, n)) < p
    # Every row/column must be touched or that fiber is unrecoverable.
    assert mask.any(axis=0).all() and mask.any(axis=1).all()
    return M0, mask


class TestExactForm:
    def test_recovers_planted_low_rank(self, rng):
        M0, mask = _planted(rng)
        res = matrixcompletion(M0 * mask, mask, config=_CFG)
        rel = np.linalg.norm(np.asarray(res.zopt) - M0) / np.linalg.norm(M0)
        assert rel < 1e-4, rel
        # X pins the observed entries exactly (projection prox).
        np.testing.assert_allclose(
            np.asarray(res.xopt)[mask], M0[mask], atol=1e-12)

    def test_unobserved_entries_ignored(self, rng):
        # Garbage outside the mask must not leak into the solve.
        M0, mask = _planted(rng)
        corrupted = M0 * mask + 1e3 * ~mask
        r1 = matrixcompletion(corrupted, mask, config=_CFG)
        r2 = matrixcompletion(M0 * mask, mask, config=_CFG)
        np.testing.assert_allclose(np.asarray(r1.zopt), np.asarray(r2.zopt),
                                   atol=1e-12)

    def test_rsvd_matches_exact(self, rng):
        M0, mask = _planted(rng)
        r_ex = matrixcompletion(M0 * mask, mask, config=_CFG)
        r_rs = matrixcompletion(M0 * mask, mask, config=_CFG,
                                prox_method="rsvd", rank=4)
        np.testing.assert_allclose(np.asarray(r_rs.zopt),
                                   np.asarray(r_ex.zopt), atol=1e-6)


class TestNoisyForm:
    def test_large_mu_approaches_exact(self, rng):
        M0, mask = _planted(rng)
        res = matrixcompletion(M0 * mask, mask, mu=1e4, config=_CFG)
        rel = np.linalg.norm(np.asarray(res.zopt) - M0) / np.linalg.norm(M0)
        assert rel < 1e-3, rel

    def test_denoises_observed_entries(self, rng):
        M0, mask = _planted(rng, p=0.8)
        noisy = (M0 + 0.05 * rng.standard_normal(M0.shape)) * mask
        res = matrixcompletion(noisy, mask, mu=20.0, config=_CFG)
        Z = np.asarray(res.zopt)
        # The completion is closer to the clean planted matrix than the
        # noisy observations are (spectral denoising).
        err_obs = np.linalg.norm((noisy - M0)[mask])
        err_fit = np.linalg.norm((Z - M0)[mask])
        assert err_fit < err_obs
        # And the objective balances rank against fit: the planted
        # rank-2 structure dominates the spectrum (noise tail shrunk).
        s = np.linalg.svd(Z, compute_uv=False)
        assert s[2] < 0.05 * s[0]


class TestBatch:
    def test_matches_serial_per_lane(self, rng):
        lanes = [_planted(rng, m=24, n=20, r=2, p=0.75) for _ in range(3)]
        Ms = np.stack([M * k for M, k in lanes])
        masks = np.stack([k for _, k in lanes])
        cfg = ADMMConfig(maxiters=800, abstol=1e-10, reltol=1e-8)
        bres = matrixcompletion_batch(Ms, masks, config=cfg)
        for b, (M0, mask) in enumerate(lanes):
            sres = matrixcompletion(M0 * mask, mask, config=cfg)
            np.testing.assert_allclose(np.asarray(bres.zopt[b]),
                                       np.asarray(sres.zopt), atol=1e-10)
            assert int(bres.steps[b]) == int(sres.steps)

    def test_per_lane_mu(self, rng):
        M0, mask = _planted(rng, m=24, n=20)
        Ms = np.stack([M0 * mask, M0 * mask])
        masks = np.stack([mask, mask])
        cfg = ADMMConfig(maxiters=600, abstol=1e-10, reltol=1e-8)
        bres = matrixcompletion_batch(Ms, masks, mu=np.array([5.0, 500.0]),
                                      config=cfg)
        s1 = matrixcompletion(M0 * mask, mask, mu=5.0, config=cfg)
        s2 = matrixcompletion(M0 * mask, mask, mu=500.0, config=cfg)
        np.testing.assert_allclose(np.asarray(bres.zopt[0]),
                                   np.asarray(s1.zopt), atol=1e-10)
        np.testing.assert_allclose(np.asarray(bres.zopt[1]),
                                   np.asarray(s2.zopt), atol=1e-10)


class TestValidation:
    def test_mask_shape(self, rng):
        with pytest.raises(ValueError, match="mask"):
            matrixcompletion(np.zeros((4, 5)), np.ones((4, 4)))

    def test_mu_positive(self, rng):
        with pytest.raises(ValueError, match="mu"):
            matrixcompletion(np.zeros((4, 4)), np.ones((4, 4)), mu=-1.0)

    def test_rsvd_needs_rank(self, rng):
        with pytest.raises(ValueError, match="rank"):
            matrixcompletion(np.zeros((4, 4)), np.ones((4, 4)),
                             prox_method="rsvd")

    def test_registry_entry(self, rng):
        M0, mask = _planted(rng, m=16, n=12)
        pf, pg, obj = get_prox_ops("matrixcompletion",
                                   {"M": M0 * mask, "mask": mask})
        Z = jnp.zeros(M0.shape)
        X = pf(Z, Z, Z, 1.0)
        np.testing.assert_allclose(np.asarray(X)[mask], M0[mask], atol=0)
        assert float(obj(X, X)) > 0
