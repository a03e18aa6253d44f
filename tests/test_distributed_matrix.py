"""Distributed MATRIX-iterate runners (round 5): sharded SDP (the
transpose-reduction pattern over the constraint stack,
parallel/sdp.py) and consensus covariance selection (Boyd ch. 7
general-form split of getProxOps.m:669-750, parallel/consensus.py).

Exactness oracles against the serial solves on the 8-virtual-device
CPU mesh (conftest), f64.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu import ADMMConfig, sdp
from admm_tpu.models.covarianceselection import (covarianceselection,
                                                 empirical_covariance)
from admm_tpu.models.covarianceselection import _obj as _covsel_obj
from admm_tpu.models.sdp import random_sdp_instance
from admm_tpu.parallel import consensus_covsel, sdp_sharded

_CFG = ADMMConfig(maxiters=20000, abstol=1e-10, reltol=1e-10)


class TestShardedSDP:
    def test_matches_serial_bit_for_bit(self, rng):
        # Same algebra, different layout: the sharded program must track
        # the serial one exactly (padded constraints are exact no-ops).
        C, A, b, Xstar, _, _ = random_sdp_instance(10, 12, 4, rng)
        ser = sdp(C, A, b, config=_CFG)
        sh = sdp_sharded(C, A, b, config=_CFG)  # m=12 over 8 shards: pads
        assert int(sh.steps) == int(ser.steps)
        np.testing.assert_allclose(np.asarray(sh.zopt), np.asarray(ser.zopt),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(sh.zopt), Xstar, atol=1e-4)

    def test_ns_projection_and_submesh(self, rng):
        C, A, b, Xstar, _, _ = random_sdp_instance(8, 6, 3, rng)
        pstar = float(np.sum(C * Xstar))
        res = sdp_sharded(C, A, b, config=ADMMConfig(maxiters=5000,
                                                     abstol=1e-8,
                                                     reltol=1e-8),
                          nshards=4, prox_method="ns", ns_iters=40)
        obj = float(np.sum(C * np.asarray(res.zopt)))
        assert abs(obj - pstar) <= 1e-2 * max(1.0, abs(pstar))
        assert res.extra["nshards"] == 4

    def test_warm_start_resumes(self, rng):
        C, A, b, *_ = random_sdp_instance(8, 5, 3, rng)
        cold = sdp_sharded(C, A, b, config=_CFG)
        warm = sdp_sharded(C, A, b, config=_CFG, x0=cold.xopt, z0=cold.zopt,
                           u0=cold.uopt)
        assert int(warm.steps) <= max(3, int(cold.steps) // 10)

    def test_engine_variants_run_sharded(self, rng):
        # The sharded data path rides the CORE engine, so variants come
        # free — spot-check relax and fast-weak reach the optimum.
        C, A, b, Xstar, _, _ = random_sdp_instance(8, 6, 3, rng)
        for variant in (dict(relax=1.5), dict(fast=True, fasttype="weak")):
            res = sdp_sharded(C, A, b, config=ADMMConfig(
                maxiters=20000, abstol=1e-10, reltol=1e-10, **variant))
            np.testing.assert_allclose(np.asarray(res.zopt), Xstar,
                                       atol=1e-4)

    def test_validation(self, rng):
        C = np.eye(4)
        with pytest.raises(ValueError, match="diag"):
            sdp_sharded(C, "diag", np.ones(4))
        with pytest.raises(ValueError, match="ns_delta"):
            sdp_sharded(C, np.zeros((2, 4, 4)), np.ones(2),
                        prox_method="ns", ns_correct=1)
        A1 = rng.standard_normal((4, 4))
        A1 = 0.5 * (A1 + A1.T)
        with pytest.raises(ValueError, match="dependent"):
            sdp_sharded(C, np.stack([A1, 2.0 * A1]), np.ones(2))


def _covsel_instance(rng, p=16, m=200):
    Sinv = np.eye(p) + 0.3 * np.triu(
        (rng.random((p, p)) < 0.1) * rng.standard_normal((p, p)), 1)
    Sinv = Sinv @ Sinv.T
    L = np.linalg.cholesky(np.linalg.inv(Sinv))
    return rng.standard_normal((m, p)) @ L.T


def _graphical_lasso_obj(D, lam, res):
    S = empirical_covariance(D)
    d = {"S": jnp.asarray(S), "lam": jnp.asarray(lam)}
    return float(_covsel_obj(jnp.asarray(res.xopt), jnp.asarray(res.zopt), d))


class TestConsensusCovsel:
    def test_matches_serial_optimum(self, rng):
        # The shards' S_i sum to the pooled covariance, so the consensus
        # optimum IS the serial optimum (objective to 1e-7; iterates to
        # the consensus stop's looser squared-norm resolution).
        D = _covsel_instance(rng)
        lam = 0.1
        ser = covarianceselection(D, lam, _CFG)
        con = consensus_covsel(D, lam, _CFG, nshards=4)
        f_ser = _graphical_lasso_obj(D, lam, ser)
        f_con = _graphical_lasso_obj(D, lam, con)
        assert abs(f_con - f_ser) <= 1e-6 * (1.0 + abs(f_ser))
        np.testing.assert_allclose(np.asarray(con.zopt),
                                   np.asarray(ser.zopt), atol=1e-3)
        assert not con.diverged

    def test_ns_matches_eigh(self, rng):
        D = _covsel_instance(rng)
        lam = 0.1
        eigh = consensus_covsel(D, lam, _CFG, nshards=4)
        ns = consensus_covsel(D, lam, _CFG, nshards=4, prox_method="ns",
                              ns_iters=30)
        assert int(ns.steps) == int(eigh.steps)
        np.testing.assert_allclose(np.asarray(ns.zopt),
                                   np.asarray(eigh.zopt), atol=1e-9)

    def test_more_shards_than_devices_and_8(self, rng):
        D = _covsel_instance(rng, p=12, m=160)
        lam = 0.15
        ser = covarianceselection(D, lam, _CFG)
        f_ser = _graphical_lasso_obj(D, lam, ser)
        for W in (8, 16):
            con = consensus_covsel(D, lam, _CFG, nshards=W)
            f_con = _graphical_lasso_obj(D, lam, con)
            assert abs(f_con - f_ser) <= 1e-5 * (1.0 + abs(f_ser)), W

    def test_warm_start_resumes(self, rng):
        D = _covsel_instance(rng, p=10, m=120)
        cold = consensus_covsel(D, 0.1, _CFG, nshards=4)
        warm = consensus_covsel(D, 0.1, _CFG, nshards=4,
                                xi0=cold.extra["xi"], ui0=cold.extra["ui"],
                                z0=cold.zopt)
        assert int(warm.steps) <= max(3, int(cold.steps) // 5)

    def test_matrix_warm_start_shape_validation(self, rng):
        D = _covsel_instance(rng, p=10, m=120)
        with pytest.raises(ValueError, match="xi0"):
            consensus_covsel(D, 0.1, _CFG, nshards=4,
                             xi0=np.zeros((4, 10)))
        with pytest.raises(ValueError, match="prox_method"):
            consensus_covsel(D, 0.1, _CFG, prox_method="qr")

    def test_fast_mode_reaches_optimum(self, rng):
        # Matrix-iterate consensus inherits the engine variants through
        # the flattened state — spot-check accelerated momentum.
        D = _covsel_instance(rng, p=12, m=160)
        lam = 0.1
        ser = covarianceselection(D, lam, _CFG)
        f_ser = _graphical_lasso_obj(D, lam, ser)
        con = consensus_covsel(D, lam, ADMMConfig(
            maxiters=20000, abstol=1e-10, reltol=1e-10, fast=True,
            fasttype="weak"), nshards=4)
        f_con = _graphical_lasso_obj(D, lam, con)
        assert abs(f_con - f_ser) <= 1e-5 * (1.0 + abs(f_ser))


class TestConsensusCovselBatch:
    def test_lanes_match_solo_consensus(self, rng):
        """2-D (lanes x shards) cohort graphical lasso: every lane must
        match the 1-D consensus solve bit-for-bit (the matrix-iterate
        tier of the consensus_lasso_batch composition)."""
        from admm_tpu.parallel import (consensus_covsel_batch, make_mesh,
                                       make_mesh2d)

        B, m, p, W = 4, 160, 10, 4
        Ds = np.stack([
            _covsel_instance(rng, p=p, m=m) for _ in range(B)])
        lams = np.geomspace(0.05, 0.2, B)
        cfg = ADMMConfig(maxiters=20000, abstol=1e-9, reltol=1e-9)
        batch = consensus_covsel_batch(Ds, lams, cfg, mesh=make_mesh2d(2, 4),
                                       nshards=W)
        sub = make_mesh(W)
        for b in range(B):
            solo = consensus_covsel(Ds[b], float(lams[b]), cfg, mesh=sub,
                                    nshards=W)
            assert int(np.asarray(batch.steps)[b]) == int(solo.steps)
            np.testing.assert_allclose(np.asarray(batch.zopt[b]),
                                       np.asarray(solo.zopt),
                                       rtol=1e-12, atol=1e-14)
        assert batch.extra["xi"].shape == (B, W, p, p)

    def test_ns_mode_and_warm_start(self, rng):
        from admm_tpu.parallel import consensus_covsel_batch, make_mesh2d

        B, m, p, W = 2, 120, 8, 4
        Ds = np.stack([_covsel_instance(rng, p=p, m=m) for _ in range(B)])
        cfg = ADMMConfig(maxiters=20000, abstol=1e-9, reltol=1e-9)
        mesh2 = make_mesh2d(2, 4)
        eigh = consensus_covsel_batch(Ds, 0.1, cfg, mesh=mesh2, nshards=W)
        ns = consensus_covsel_batch(Ds, 0.1, cfg, mesh=mesh2, nshards=W,
                                    prox_method="ns", ns_iters=30)
        np.testing.assert_allclose(np.asarray(ns.zopt),
                                   np.asarray(eigh.zopt), atol=1e-8)
        warm = consensus_covsel_batch(Ds, 0.1, cfg, mesh=mesh2, nshards=W,
                                      xi0=eigh.extra["xi"],
                                      ui0=eigh.extra["ui"], z0=eigh.zopt)
        assert int(np.asarray(warm.steps).max()) <= max(
            3, int(np.asarray(eigh.steps).max()) // 5)

    def test_validation(self, rng):
        from admm_tpu.parallel import consensus_covsel_batch, make_mesh2d

        Ds = np.zeros((3, 20, 4))
        with pytest.raises(ValueError, match="divide"):
            consensus_covsel_batch(Ds, 0.1, mesh=make_mesh2d(2, 4))
        with pytest.raises(ValueError, match="2-D"):
            from admm_tpu.parallel import make_mesh

            consensus_covsel_batch(np.zeros((2, 20, 4)), 0.1,
                                   mesh=make_mesh())
        with pytest.raises(ValueError, match="prox_method"):
            consensus_covsel_batch(np.zeros((2, 20, 4)), 0.1,
                                   mesh=make_mesh2d(2, 4),
                                   prox_method="qr")
