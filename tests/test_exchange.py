"""Exchange ADMM oracle tests (Boyd et al. 2011, section 7.3.2).

Quadratic agents admit a closed-form market equilibrium (KKT of the
sum-coupled program), so exactness is assertable directly — the
constructible-truth pattern of the reference testers (SURVEY.md
section 4) applied to the third distributed paradigm.  Runs on the
8-virtual-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu import ADMMConfig
from admm_tpu.parallel import exchange_admm, exchange_quadratic, make_mesh

_CFG = ADMMConfig(maxiters=20000, abstol=1e-11, reltol=1e-11)


def _instance(rng, W=8, m=12, n=6):
    As = rng.standard_normal((W, m, n))
    bs = rng.standard_normal((W, m))
    return As, bs


def _equilibrium(As, bs):
    """Closed form: x_i = G_i^{-1}(A_i^T b_i - nu),
    nu = (sum G_i^{-1})^{-1} sum G_i^{-1} A_i^T b_i."""
    Ginv = np.stack([np.linalg.inv(A.T @ A) for A in As])
    Atb = np.einsum("wmi,wm->wi", As, bs)
    lhs = Ginv.sum(0)
    rhs = np.einsum("wij,wj->i", Ginv, Atb)
    nu = np.linalg.solve(lhs, rhs)
    xs = np.einsum("wij,wj->wi", Ginv, Atb - nu[None, :])
    return xs, nu


class TestExchangeQuadratic:
    def test_reaches_market_equilibrium(self, rng):
        As, bs = _instance(rng)
        xs, nu = _equilibrium(As, bs)
        res = exchange_quadratic(As, bs, config=_CFG)
        got = np.asarray(res.xopt)
        np.testing.assert_allclose(got, xs, atol=1e-7)
        # Clearing constraint and price recovery: rho * u -> nu.
        assert np.linalg.norm(got.sum(0)) <= 1e-7
        np.testing.assert_allclose(res.rho_final * np.asarray(res.uopt), nu,
                                   atol=1e-7)
        assert not res.diverged

    def test_price_is_shared_gradient(self, rng):
        # KKT: grad f_i(x_i*) = -nu for EVERY agent.
        As, bs = _instance(rng, W=8, m=10, n=4)
        res = exchange_quadratic(As, bs, config=_CFG)
        x = np.asarray(res.xopt)
        nu = res.rho_final * np.asarray(res.uopt)
        for i in range(As.shape[0]):
            g = As[i].T @ (As[i] @ x[i] - bs[i])
            np.testing.assert_allclose(g, -nu, atol=1e-6)

    def test_matches_fewer_agents_than_devices(self, rng):
        As, bs = _instance(rng, W=4)
        xs, _ = _equilibrium(As, bs)
        res = exchange_quadratic(As, bs, config=_CFG)
        np.testing.assert_allclose(np.asarray(res.xopt), xs, atol=1e-7)
        assert res.extra["nagents"] == 4

    def test_more_agents_than_devices(self, rng):
        # 16 agents on the 8-device mesh: each device batches two.
        As, bs = _instance(rng, W=16, m=9, n=5)
        xs, _ = _equilibrium(As, bs)
        res = exchange_quadratic(As, bs, config=_CFG)
        np.testing.assert_allclose(np.asarray(res.xopt), xs, atol=1e-7)

    def test_warm_start_resumes(self, rng):
        As, bs = _instance(rng)
        cold = exchange_quadratic(As, bs, config=_CFG)
        warm = exchange_quadratic(As, bs, config=_CFG, xi0=cold.xopt,
                                  u0=cold.uopt)
        assert int(warm.steps) <= max(3, int(cold.steps) // 10)

    def test_rbadaptive_agrees(self, rng):
        As, bs = _instance(rng)
        xs, _ = _equilibrium(As, bs)
        res = exchange_quadratic(
            As, bs, config=ADMMConfig(maxiters=20000, abstol=1e-11,
                                      reltol=1e-11, rbadaptive=True))
        np.testing.assert_allclose(np.asarray(res.xopt), xs, atol=1e-7)

    def test_stall_detector_flags_plateau(self, rng):
        # An unreachable tolerance with a plateau window must stall-stop
        # early instead of burning the iteration cap.
        As, bs = _instance(rng)
        res = exchange_quadratic(
            As, bs, config=ADMMConfig(maxiters=20000, abstol=1e-30,
                                      reltol=1e-30, stallwindow=50))
        assert res.stalled
        assert int(res.steps) < 20000

    def test_record_iterates_traces_aggregates(self, rng):
        As, bs = _instance(rng)
        res = exchange_quadratic(
            As, bs, config=ADMMConfig(maxiters=2000, abstol=1e-9,
                                      reltol=1e-9, record_iterates=True))
        k = int(res.steps)
        assert np.isfinite(res.trace("xvals")[:k]).all()
        # The recorded means shrink toward clearing.
        norms = np.linalg.norm(res.trace("xvals"), axis=1)
        assert norms[-1] < norms[0]

    def test_validation(self, rng):
        As, bs = _instance(rng, W=4)
        with pytest.raises(ValueError):
            exchange_quadratic(As[0], bs[0])
        with pytest.raises(ValueError):
            exchange_quadratic(As, bs[:, :-1])
        with pytest.raises(ValueError):
            exchange_quadratic(As, bs, config=_CFG,
                               xi0=np.zeros((3, As.shape[2])))
        with pytest.raises(ValueError):
            # 12 agents on an 8-device mesh: more than the mesh but not
            # a multiple of it (fewer builds a sub-mesh instead).
            exchange_quadratic(rng.standard_normal((12, 8, 4)),
                               rng.standard_normal((12, 8)))


def _stacked_quad_prox_f(x, z, u, rho, d):
    # Per-agent quadratic prox on the stacked (W, n) iterate: the core
    # engine's x-update for the exchange splitting x_i - z_i = 0.
    rhs = d["Atb"] + rho * (z - u)
    y = jnp.einsum("wji,wj->wi", d["V"], rhs) / (d["w"] + rho)
    return jnp.einsum("wij,wj->wi", d["V"], y)


def _stacked_exchange_prox_g(x, z, u, rho, d):
    # Projection onto {sum_i z_i = 0}: remove the per-coordinate mean.
    y = x + u
    return y - jnp.mean(y, axis=0, keepdims=True)


class TestExchangeVariants:
    """Relaxation and fast/accelerated momentum on the exchange runner
    must reproduce the core engine run on the stacked formulation
    (shape_x = (W, n), A = I, B = -I, g = indicator{sum z_i = 0}) —
    the consensus runners' exactness-oracle pattern
    (test_parallel.py::test_consensus_fast_matches_stacked_engine)."""

    @pytest.mark.parametrize("variant,exact", [
        # Deterministic stop rules: exact trajectory parity incl. steps.
        (dict(relax=1.5), True),
        (dict(fast=True, fasttype="strong", domaxiters=True, maxiters=60),
         True),
        # Weak (restart) mode: the restart rule d >= restart*dprev is
        # ULP-sensitive, and the sharded mesh's reduction order differs
        # from the engine's single-array order, so restart flags (hence
        # steps) can flip late in the run — compare the d-value PREFIX
        # (before accumulated restarts diverge) plus the fixed point.
        (dict(fast=True, fasttype="weak"), False),
        (dict(fast=True, fasttype="weak", relax=1.3), False),
    ])
    def test_matches_stacked_engine(self, rng, variant, exact):
        from admm_tpu.engine import admm

        As, bs = _instance(rng, W=4, m=10, n=5)
        W, _, n = As.shape
        G = np.einsum("wmi,wmj->wij", As, As)
        w, V = np.linalg.eigh(G)
        Atb = np.einsum("wmi,wm->wi", As, bs)
        data = {"w": jnp.asarray(w), "V": jnp.asarray(V),
                "Atb": jnp.asarray(Atb)}

        cfg = ADMMConfig(**{"maxiters": 400, "abstol": 1e-9,
                            "reltol": 1e-9, **variant})
        eng = admm(_stacked_quad_prox_f, _stacked_exchange_prox_g, cfg,
                   A=1.0, B=-1.0, c=0.0, shape_x=(W, n), shape_z=(W, n),
                   dtype=np.float64, data=data)
        exc = exchange_quadratic(As, bs, config=cfg)
        if exact:
            assert int(exc.steps) == int(eng.steps)
            np.testing.assert_allclose(np.asarray(exc.xopt),
                                       np.asarray(eng.xopt),
                                       rtol=1e-8, atol=1e-10)
            # The engine's stacked duals all equal the collapsed price.
            eng_u = np.asarray(eng.uopt)
            np.testing.assert_allclose(eng_u, np.broadcast_to(
                np.asarray(exc.uopt)[None, :], eng_u.shape),
                rtol=1e-8, atol=1e-10)
        else:
            k = min(int(exc.steps), int(eng.steps), 50)
            np.testing.assert_allclose(exc.dvals[:k], eng.dvals[:k],
                                       rtol=1e-9, atol=1e-12)
            # Both land on the same market equilibrium.
            xs, nu = _equilibrium(As, bs)
            np.testing.assert_allclose(np.asarray(exc.xopt), xs, atol=1e-5)
            np.testing.assert_allclose(np.asarray(eng.xopt), xs, atol=1e-5)

    @pytest.mark.parametrize("variant", [
        dict(relax=1.5),
        dict(fast=True, fasttype="strong"),
        dict(fast=True, fasttype="weak"),
    ])
    def test_variants_reach_equilibrium(self, rng, variant):
        As, bs = _instance(rng)
        xs, nu = _equilibrium(As, bs)
        res = exchange_quadratic(
            As, bs, config=ADMMConfig(**{"maxiters": 20000, "abstol": 1e-11,
                                         "reltol": 1e-11, **variant}))
        np.testing.assert_allclose(np.asarray(res.xopt), xs, atol=1e-5)
        assert not res.diverged


def _l1_quad_prox(vi, rho, d):
    # f_i(x) = 0.5||x - c_i||^2 + gamma ||x||_1 (non-quadratic, nonsmooth):
    # prox = soft_threshold((c_i + rho v)/(1 + rho), gamma/(1 + rho)).
    from admm_tpu.ops.prox import soft_threshold

    return soft_threshold((d["c"] + rho * vi) / (1.0 + rho),
                          d["gamma"] / (1.0 + rho))


def _nonneg_quad_prox(vi, rho, d):
    # f_i(x) = 0.5||x - c_i||^2 + indicator{x >= 0}:
    # prox = max((c_i + rho v) / (1 + rho), 0).
    return jnp.maximum((d["c"] + rho * vi) / (1.0 + rho), 0.0)


class TestExchangeGeneric:
    def test_nonneg_agents_against_cvx_style_oracle(self, rng):
        # min sum_i 0.5||x_i - c_i||^2 s.t. sum x_i = 0, x_i >= 0:
        # with sum c_i <= 0 coordinatewise... instead assert KKT directly:
        # x_i = max(c_i - nu, 0) with sum_i x_i = 0 (per coordinate a
        # scalar water-filling equation).
        W, n = 8, 5
        c = rng.standard_normal((W, n))
        mesh = make_mesh()
        res = exchange_admm(_nonneg_quad_prox, {"c": jnp.asarray(c)}, n,
                            config=_CFG, mesh=mesh, nagents=W)
        x = np.asarray(res.xopt)
        nu = res.rho_final * np.asarray(res.uopt)
        assert np.linalg.norm(x.sum(0)) <= 1e-7
        assert x.min() >= -1e-9
        # KKT of each agent: x_i = max(c_i - nu, 0).
        np.testing.assert_allclose(x, np.maximum(c - nu[None, :], 0.0),
                                   atol=1e-6)

    def test_soft_threshold_agents_kkt(self, rng):
        # min sum_i 0.5||x_i - c_i||^2 + gamma||x_i||_1 s.t. sum x_i = 0:
        # KKT gives x_i = S(c_i - nu, gamma) per agent with the shared
        # clearing price nu = rho * u — a NONSMOOTH agent family
        # exercising the soft-threshold prox through exchange.
        from admm_tpu.ops.prox import soft_threshold

        W, n = 8, 6
        c = rng.standard_normal((W, n))
        gamma = 0.3
        res = exchange_admm(
            _l1_quad_prox,
            {"c": jnp.asarray(c), "gamma": jnp.asarray(gamma)},
            n, config=_CFG, nagents=W)
        x = np.asarray(res.xopt)
        nu = res.rho_final * np.asarray(res.uopt)
        assert np.linalg.norm(x.sum(0)) <= 1e-7
        ref = np.asarray(soft_threshold(jnp.asarray(c - nu[None, :]), gamma))
        np.testing.assert_allclose(x, ref, atol=1e-6)

    def test_soft_threshold_agents_fast_agrees(self, rng):
        # The accelerated mode on the nonsmooth agents lands on the same
        # KKT point (weak-convexity restart mode is built for exactly
        # this composite class).
        from admm_tpu.ops.prox import soft_threshold

        W, n = 8, 6
        c = rng.standard_normal((W, n))
        gamma = 0.3
        res = exchange_admm(
            _l1_quad_prox,
            {"c": jnp.asarray(c), "gamma": jnp.asarray(gamma)},
            n, config=ADMMConfig(maxiters=20000, abstol=1e-11, reltol=1e-11,
                                 fast=True, fasttype="weak"),
            nagents=W)
        x = np.asarray(res.xopt)
        nu = res.rho_final * np.asarray(res.uopt)
        ref = np.asarray(soft_threshold(jnp.asarray(c - nu[None, :]), gamma))
        np.testing.assert_allclose(x, ref, atol=1e-5)
        assert np.linalg.norm(x.sum(0)) <= 1e-5
