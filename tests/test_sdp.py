"""Standard-form SDP oracle tests (beyond-reference family).

Oracle strategy: random_sdp_instance constructs a full primal-dual KKT
triple (X*, y*, S*) with strict complementarity, so the true optimum
and optimal value are known exactly — the reference testers'
constructible-truth pattern (SURVEY.md section 4) applied to the conic
case.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu import ADMMConfig, sdp
from admm_tpu.models import get_prox_ops
from admm_tpu.models.sdp import make_prox_ops, random_sdp_instance
from admm_tpu.ops.matfun import psd_project_ns
from admm_tpu.ops.prox import psd_project

_CFG = ADMMConfig(maxiters=20000, abstol=1e-10, reltol=1e-10)


def _kkt_asserts(res, C, A, b, pstar, tol=1e-6):
    X = np.asarray(res.xopt)
    Z = np.asarray(res.zopt)
    U = np.asarray(res.uopt)
    rho = float(res.rho_final) if res.rho_final is not None else 1.0
    # Primal feasibility: affine on X, conic on Z, splitting consistency.
    np.testing.assert_allclose(np.einsum("mij,ij->m", A, X), b, atol=1e-6)
    assert np.linalg.eigvalsh(Z).min() >= -1e-8
    assert np.linalg.norm(X - Z) <= 1e-5 * max(1.0, np.linalg.norm(X))
    # Optimal value.
    obj = float(np.sum(C * Z))
    assert abs(obj - pstar) <= tol * max(1.0, abs(pstar))
    # Dual recovery: S = -rho U must be (near) PSD and complementary.
    S = -rho * U
    S = 0.5 * (S + S.T)
    assert np.linalg.eigvalsh(S).min() >= -1e-5
    assert abs(np.sum(S * Z)) <= 1e-5 * max(1.0, np.linalg.norm(S) * np.linalg.norm(Z))


class TestPSDProjection:
    def test_eigh_projection_matches_dense_oracle(self, rng):
        W = rng.standard_normal((12, 12))
        W = 0.5 * (W + W.T)
        e, Q = np.linalg.eigh(W)
        ref = (Q * np.maximum(e, 0.0)) @ Q.T
        np.testing.assert_allclose(np.asarray(psd_project(jnp.asarray(W))),
                                   ref, atol=1e-12)

    def test_ns_projection_well_separated_spectrum(self, rng):
        # Spectrum bounded away from zero on both sides: the NS regime.
        Q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
        e = np.concatenate([rng.uniform(0.5, 2.0, 8), -rng.uniform(0.5, 2.0, 8)])
        W = (Q * e) @ Q.T
        ref = (Q * np.maximum(e, 0.0)) @ Q.T
        got = np.asarray(psd_project_ns(jnp.asarray(W), iters=30))
        np.testing.assert_allclose(got, ref, atol=1e-8)

    def test_ns_projection_small_modes_bounded_absolute_error(self, rng):
        # Near-null modes: NS is inexact there but the ABSOLUTE error
        # stays at the scale of the small eigenvalues (module caveat).
        Q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
        e = np.concatenate([rng.uniform(0.5, 2.0, 7), [1e-4, -1e-4],
                            -rng.uniform(0.5, 2.0, 7)])
        W = (Q * e) @ Q.T
        ref = (Q * np.maximum(e, 0.0)) @ Q.T
        got = np.asarray(psd_project_ns(jnp.asarray(W), iters=30))
        assert np.linalg.norm(got - ref) <= 1e-3


class TestSDP:
    def test_dense_constraints_reach_known_optimum(self, rng):
        # Uniqueness needs m >= r(r+1)/2 generic constraints restricted
        # to the rank-r optimal face (here 10): m=12 > 10.
        C, A, b, Xstar, ystar, Sstar = random_sdp_instance(10, 12, 4, rng)
        pstar = float(np.sum(C * Xstar))
        res = sdp(C, A, b, config=_CFG)
        _kkt_asserts(res, C, A, b, pstar)
        # Strict complementarity + generic data => unique optimum.
        np.testing.assert_allclose(np.asarray(res.zopt), Xstar, atol=1e-4)

    def test_ns_projection_mode(self, rng):
        # The matmul-only z-prox on the same instance, looser bar (the
        # projection is inexact near the crossing; module caveat).
        C, A, b, Xstar, _, _ = random_sdp_instance(10, 6, 4, rng)
        pstar = float(np.sum(C * Xstar))
        res = sdp(C, A, b, config=ADMMConfig(maxiters=5000, abstol=1e-8,
                                             reltol=1e-8),
                  prox_method="ns", ns_iters=40)
        obj = float(np.sum(C * np.asarray(res.zopt)))
        assert abs(obj - pstar) <= 1e-2 * max(1.0, abs(pstar))

    def test_diag_constraint_matches_dense_path(self, rng):
        # diag(X) = b expressed both ways must agree.
        n = 8
        C = rng.standard_normal((n, n))
        C = 0.5 * (C + C.T)
        b = rng.uniform(0.5, 1.5, n)
        A = np.stack([np.outer(np.eye(n)[i], np.eye(n)[i]) for i in range(n)])
        r_diag = sdp(C, "diag", b, config=_CFG)
        r_dense = sdp(C, A, b, config=_CFG)
        np.testing.assert_allclose(np.asarray(r_diag.zopt),
                                   np.asarray(r_dense.zopt), atol=1e-6)
        np.testing.assert_allclose(np.diagonal(np.asarray(r_diag.xopt)), b,
                                   atol=1e-8)

    def test_maxcut_relaxation_bound(self, rng):
        # Goemans-Williamson relaxation on a small graph: the SDP value
        # must upper-bound the best cut (checked exhaustively).
        n = 8
        W = (rng.random((n, n)) < 0.4).astype(float)
        W = np.triu(W, 1)
        W = W + W.T
        L = np.diag(W.sum(1)) - W
        res = sdp(-0.25 * L, "diag", np.ones(n), config=_CFG)
        sdp_val = -float(np.sum(-0.25 * L * np.asarray(res.zopt)))
        best = max(
            0.25 * float(s @ L @ s)
            for k in range(2 ** (n - 1))
            for s in [np.array([1.0] + [1.0 if (k >> i) & 1 else -1.0
                                        for i in range(n - 1)])]
        )
        assert sdp_val >= best - 1e-6
        assert sdp_val <= 1.5 * best + 1e-6  # GW-style sanity band

    def test_warm_start_resumes(self, rng):
        C, A, b, Xstar, _, _ = random_sdp_instance(8, 5, 3, rng)
        cold = sdp(C, A, b, config=_CFG)
        warm = sdp(C, A, b, config=_CFG, x0=cold.xopt, z0=cold.zopt,
                   u0=cold.uopt)
        assert int(warm.steps) <= max(3, int(cold.steps) // 10)

    def test_registry_entry(self, rng):
        C, A, b, *_ = random_sdp_instance(6, 4, 2, rng)
        pf, pg, obj = get_prox_ops("sdp", C=C, A=A, b=b)
        X = jnp.zeros((6, 6))
        out = pf(X, X, X, 1.0)
        np.testing.assert_allclose(np.einsum("mij,ij->m", A, np.asarray(out)),
                                   b, atol=1e-8)

    def test_validation(self, rng):
        C = np.eye(4)
        with pytest.raises(ValueError):
            sdp(C, "diagonal", np.ones(4))
        with pytest.raises(ValueError):
            sdp(C, np.zeros((2, 3, 3)), np.ones(2))
        with pytest.raises(ValueError):
            sdp(C, np.zeros((2, 4, 4)), np.ones(3))
        with pytest.raises(ValueError):
            make_prox_ops(C, "diag", np.ones(4), prox_method="qr")
        with pytest.raises(ValueError):
            sdp(None)
        with pytest.raises(ValueError):
            sdp(C, None, np.ones(4))
        with pytest.raises(ValueError):
            sdp(C, "diag", None)
        # ns_correct > 0 with ns_delta = 0 diverges (measured); setup error.
        with pytest.raises(ValueError, match="ns_delta"):
            make_prox_ops(C, "diag", np.ones(4), prox_method="ns",
                          ns_correct=2)
        # Linearly dependent constraints -> singular Gram, clear error.
        A1 = rng.standard_normal((4, 4))
        A1 = 0.5 * (A1 + A1.T)
        Adep = np.stack([A1, 2.0 * A1])
        with pytest.raises(ValueError, match="dependent"):
            make_prox_ops(C, Adep, np.ones(2))


class TestSDPBatch:
    def test_diag_lanes_match_serial(self, rng):
        from admm_tpu import sdp_batch

        n, B = 6, 3
        Cs = rng.standard_normal((B, n, n))
        Cs = 0.5 * (Cs + np.swapaxes(Cs, -1, -2))
        b = np.ones(n)
        res = sdp_batch(Cs, "diag", b, config=_CFG)
        for i in range(B):
            serial = sdp(Cs[i], "diag", b, config=_CFG)
            np.testing.assert_allclose(np.asarray(res.zopt[i]),
                                       np.asarray(serial.zopt), atol=1e-8)

    def test_dense_shared_A_per_lane_b(self, rng):
        from admm_tpu import sdp_batch

        n, m, B = 6, 4, 2
        A = rng.standard_normal((m, n, n))
        A = 0.5 * (A + np.swapaxes(A, -1, -2))
        Cs = np.stack([np.eye(n) + 0.1 * i for i in range(B)])
        bs = rng.standard_normal((B, m)) * 0.1
        res = sdp_batch(Cs, A, bs, config=_CFG)
        for i in range(B):
            serial = sdp(Cs[i], A, bs[i], config=_CFG)
            np.testing.assert_allclose(np.asarray(res.zopt[i]),
                                       np.asarray(serial.zopt), atol=1e-7)
