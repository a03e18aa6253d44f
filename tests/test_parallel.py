"""Distributed-layer tests on the 8-virtual-device CPU mesh — the
cluster-free analog of the reference's local MATLAB worker pool
(SURVEY.md section 4 'Multi-worker testing without a cluster')."""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, lasso, linearsvm
from admm_tpu.parallel import (
    consensus_lasso,
    linearsvm_sharded,
    make_mesh,
    make_sliced_prox,
    pad_rows,
    shard_rows,
)


def _lasso_instance(seed, rows, cols):
    rng = np.random.default_rng(seed)
    testx = rng.standard_normal(cols) * (rng.random(cols) < 0.6)
    D = rng.standard_normal((rows, cols))
    D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
    s = D @ testx + np.sqrt(0.001) * rng.standard_normal(rows)
    lam = 0.1 * np.max(np.abs(D.T @ s))
    return D, s, lam, testx


def _lasso_obj(D, s, lam, x):
    return 0.5 * np.sum((D @ x - s) ** 2) + lam * np.sum(np.abs(x))


def test_mesh_and_sharding_helpers():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    M = np.arange(20).reshape(10, 2).astype(float)
    Mp, n_pad = pad_rows(M, 8)
    assert Mp.shape == (16, 2) and n_pad == 6
    blocks = shard_rows(Mp, 8)
    assert blocks.shape == (8, 2, 2)
    np.testing.assert_array_equal(blocks.reshape(16, 2), Mp)


@pytest.mark.parametrize("nshards", [2, 8])
def test_consensus_lasso_agrees_with_serial(nshards):
    """Consensus ADMM (getProxOps.m:1217-1343) must reach an objective
    close to the serial LASSO solution."""
    D, s, lam, testx = _lasso_instance(0, 512, 32)
    serial = lasso(D, s, lam, ADMMConfig(maxiters=5000))
    par = consensus_lasso(
        D, s, lam, ADMMConfig(maxiters=5000), mesh=make_mesh(), nshards=nshards
    )
    assert par.steps < 5000
    x_serial = np.asarray(serial.xopt)
    z_par = np.asarray(par.zopt)  # the consensus variable is the solution
    f_serial = _lasso_obj(D, s, lam, x_serial)
    f_par = _lasso_obj(D, s, lam, z_par)
    assert abs(f_par - f_serial) <= 1e-2 * abs(f_serial)
    # Both beat the planted point.
    assert f_par < _lasso_obj(D, s, lam, testx)


def test_consensus_padding_is_exact():
    """Row counts not divisible by the shard count must not change the
    answer (zero-row padding is exact for D^T D and D^T s)."""
    D, s, lam, _ = _lasso_instance(1, 509, 24)  # 509 % 8 != 0
    par = consensus_lasso(D, s, lam, ADMMConfig(maxiters=5000), nshards=8)
    ser = lasso(D, s, lam, ADMMConfig(maxiters=5000))
    f_par = _lasso_obj(D, s, lam, np.asarray(par.zopt))
    f_ser = _lasso_obj(D, s, lam, np.asarray(ser.xopt))
    assert abs(f_par - f_ser) <= 1e-2 * abs(f_ser)


def test_consensus_elasticnet_matches_serial_to_1e6():
    """Second consensus instantiation (VERDICT r2 #8): consensus elastic
    net must match the SERIAL elasticnet objective to 1e-6 relative on
    the 8-virtual-device mesh."""
    from admm_tpu import elasticnet
    from admm_tpu.parallel import consensus_elasticnet

    D, s, lam, _ = _lasso_instance(3, 512, 24)
    alpha = 0.6

    def obj(x):
        return (0.5 * np.sum((D @ x - s) ** 2)
                + lam * (alpha * np.sum(np.abs(x))
                         + 0.5 * (1 - alpha) * np.sum(x**2)))

    tight = ADMMConfig(maxiters=20000, abstol=1e-12, reltol=1e-12)
    serial = elasticnet(D, s, lam, alpha, tight)
    par = consensus_elasticnet(D, s, lam, alpha, tight, nshards=8)
    assert par.steps < 20000 and not par.diverged
    f_serial = obj(np.asarray(serial.xopt))
    f_par = obj(np.asarray(par.zopt))
    assert abs(f_par - f_serial) <= 1e-6 * abs(f_serial), (f_par, f_serial)


def test_consensus_elasticnet_alpha1_is_consensus_lasso():
    """alpha=1 degenerates to the lasso global prox bit-for-bit."""
    from admm_tpu.parallel import consensus_elasticnet

    D, s, lam, _ = _lasso_instance(4, 256, 16)
    cfg = ADMMConfig(maxiters=3000)
    a = consensus_elasticnet(D, s, lam, 1.0, cfg, nshards=8)
    b = consensus_lasso(D, s, lam, cfg, nshards=8)
    assert a.steps == b.steps
    np.testing.assert_array_equal(np.asarray(a.zopt), np.asarray(b.zopt))


def _ridge_local(z, ui, rho, d):
    import jax.numpy as jnp

    rhs = d["Dtsi"] + rho * (z[None, :] - ui)
    return jnp.einsum("wij,wj->wi", d["Minv"], rhs)


def _ridge_global(xbar, ubar, rho, W, d):
    # prox of (lam/2)||z||^2 at parameter rho*W: shrink toward zero.
    return (xbar + ubar) * (rho * W) / (rho * W + d["lam"])


def test_generic_consensus_admm_ridge():
    """The generic consensus engine with a ridge global prox must match
    the closed-form ridge solution — proves consensus_admm is reusable
    beyond the reference's LASSO instantiation."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from admm_tpu.parallel import consensus_admm

    rng = np.random.default_rng(5)
    W, mi, n = 8, 64, 24
    lam = 0.7
    D = rng.standard_normal((W * mi, n))
    s = rng.standard_normal(W * mi)
    x_closed = np.linalg.solve(D.T @ D + lam * np.eye(n), D.T @ s)

    mesh = make_mesh()
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    Di = jax.device_put(jnp.asarray(shard_rows(D, W)), spec)
    si = jax.device_put(jnp.asarray(shard_rows(s, W)), spec)
    rho = 1.0
    G = jnp.einsum("wij,wik->wjk", Di, Di) + rho * jnp.eye(n)[None]
    data = {
        "Minv": jnp.linalg.inv(G),
        "Dtsi": jnp.einsum("wij,wi->wj", Di, si),
        "lam": jnp.asarray(lam),
    }
    res = consensus_admm(_ridge_local, _ridge_global, data, n,
                         ADMMConfig(maxiters=5000), mesh=mesh, nshards=W)
    np.testing.assert_allclose(np.asarray(res.zopt), x_closed, atol=1e-3)


def _svm_instance(seed, mpos, mneg, sep):
    rng = np.random.default_rng(seed)
    bp = np.linspace(0, 2, mpos)
    bn = np.linspace(0, 2, mneg)
    pos = np.stack([bp + rng.random(mpos) - sep * rng.random(mpos),
                    bp - rng.random(mpos) + sep * rng.random(mpos)], 1)
    neg = np.stack([bn - rng.random(mneg) + sep * rng.random(mneg),
                    bn + rng.random(mneg) - sep * rng.random(mneg)], 1)
    D = np.concatenate([pos, neg])
    ell = np.concatenate([np.ones(mpos), -np.ones(mneg)])
    return D, ell


@pytest.mark.parametrize("loss", ["hinge", "01"])
def test_sharded_svm_agrees_with_serial(loss):
    """Distributed transpose-reduction SVM (unwrappedadmm.m:96-141) must
    recover the same separator as the serial path."""
    D, ell = _svm_instance(0, 128, 128, 0.5)
    C = 1.0
    res = linearsvm_sharded(D, ell, C, ADMMConfig(maxiters=1000), loss=loss)
    x = np.asarray(res.xopt)
    relerror = abs(1.0 - (-x[1] / x[0]))
    assert relerror <= 0.05, f"slope rel-err {relerror}"

    serial = linearsvm(D, ell, C, ADMMConfig(maxiters=1000), loss=loss)
    xs = np.asarray(serial.xopt)
    # Same decision boundary up to tolerance.
    assert abs((-x[1] / x[0]) - (-xs[1] / xs[0])) <= 0.05


def test_sharded_svm_padding():
    """Row counts not divisible by the shard count (zero-pad + mask)."""
    D, ell = _svm_instance(0, 100, 101, 0.5)  # 201 rows -> pads to 208
    res = linearsvm_sharded(D, ell, 1.0, ADMMConfig(maxiters=1000))
    x = np.asarray(res.xopt)
    assert abs(1.0 - (-x[1] / x[0])) <= 0.06


def test_sliced_prox_matches_direct():
    """A sliced prox assembled via shard_map must equal the direct
    computation (the parproxf contract, admm.m:416-436)."""
    import jax.numpy as jnp

    mesh = make_mesh()
    n = 64
    slice_len = n // 8

    def prox_slice(x, z, u, rho, k):
        lo = k * slice_len
        seg = jax.lax.dynamic_slice(z - u, (lo,), (slice_len,))
        return seg * rho

    import jax

    prox = make_sliced_prox(prox_slice, slice_len, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    u = jnp.asarray(rng.standard_normal(n))
    out = np.asarray(prox(x, z, u, 1.7))
    np.testing.assert_allclose(out, np.asarray(1.7 * (z - u)), atol=1e-12)


def test_sliced_prox_inside_engine():
    """The sliced prox must compose with the jitted engine: solve the
    model problem with the x-prox computed slice-parallel."""
    import jax.numpy as jnp

    from admm_tpu import Hooks, admm
    from admm_tpu.ops.solve import SymShiftSolver

    rng = np.random.default_rng(3)
    n = 64
    P = rng.standard_normal((n, n))
    Q = rng.standard_normal((n, n))
    r = rng.standard_normal(n)
    s = rng.standard_normal(n)

    cfg = ADMMConfig(maxiters=5000)
    PtPinv = SymShiftSolver.from_matrix(P.T @ P).materialize_inverse(cfg.rho)
    QtQinv = SymShiftSolver.from_matrix(Q.T @ Q).materialize_inverse(cfg.rho)
    Ptr = jnp.asarray(P.T @ r)
    Qts = jnp.asarray(Q.T @ s)
    PtPinv = jnp.asarray(PtPinv)
    QtQinv = jnp.asarray(QtQinv)

    slice_len = n // 8

    def prox_f_slice(x, z, u, rho, k):
        # Each device computes its row-slice of the full solve.
        rows = jax.lax.dynamic_slice_in_dim(PtPinv, k * slice_len, slice_len, axis=0)
        return rows @ (Ptr + rho * (z - u))

    import jax

    prox_f = make_sliced_prox(prox_f_slice, slice_len, make_mesh())

    def prox_g(x, z, u, rho):
        return QtQinv @ (Qts + rho * (x + u))

    res = admm(prox_f, prox_g, cfg, A=1.0, B=-1.0, c=0.0, m=n)
    truex = np.linalg.solve(P.T @ P + Q.T @ Q, P.T @ r + Q.T @ s)
    np.testing.assert_allclose(np.asarray(res.xopt), truex, atol=1e-3)


import jax  # noqa: E402  (used inside tests)


def test_consensus_relaxation_converges():
    """Over-relaxed consensus (relax=1.5) must reach the serial objective
    — and typically in fewer iterations than the unrelaxed run (Boyd
    sec. 3.4.3; strict extension over the reference, whose consensus
    path ignores options.relax — see parallel/consensus.py docstring)."""
    D, s, lam, _ = _lasso_instance(2, 512, 32)
    base = consensus_lasso(D, s, lam, ADMMConfig(maxiters=5000))
    rel = consensus_lasso(D, s, lam, ADMMConfig(maxiters=5000, relax=1.5))
    f_base = _lasso_obj(D, s, lam, np.asarray(base.zopt))
    f_rel = _lasso_obj(D, s, lam, np.asarray(rel.zopt))
    assert abs(f_rel - f_base) <= 1e-2 * abs(f_base)
    assert rel.steps <= base.steps + 5


def test_consensus_hnorm_stopping_and_history():
    """stopcond='both' must record Hnormsq and stop; convtest must not
    flag a correct solve as diverged."""
    D, s, lam, _ = _lasso_instance(3, 512, 32)
    res = consensus_lasso(
        D, s, lam,
        ADMMConfig(maxiters=5000, stopcond="both", convtest=True))
    assert not res.diverged
    assert res.Hnormsq is not None and len(res.Hnormsq) == res.steps
    assert res.steps < 5000
    # H-norms decrease overall on a correct solve.
    h = res.Hnormsq
    assert h[-1] < h[0]


def test_consensus_warm_start_resumes():
    """xi0/ui0/z0 must resume a consensus solve: a 20-iteration prefix
    plus a warm-started continuation lands on the cold-start answer
    (makes orbax checkpoints of sharded state actually resumable)."""
    D, s, lam, _ = _lasso_instance(4, 512, 32)
    cold = consensus_lasso(D, s, lam, ADMMConfig(maxiters=5000))
    pre = consensus_lasso(D, s, lam, ADMMConfig(maxiters=20, domaxiters=True))
    resumed = consensus_lasso(
        D, s, lam, ADMMConfig(maxiters=5000),
        xi0=pre.extra["xi"], ui0=pre.extra["ui"], z0=pre.zopt)
    f_cold = _lasso_obj(D, s, lam, np.asarray(cold.zopt))
    f_res = _lasso_obj(D, s, lam, np.asarray(resumed.zopt))
    assert abs(f_res - f_cold) <= 1e-3 * abs(f_cold)
    # Resuming from iteration 20 must cost fewer iterations than cold.
    assert resumed.steps < cold.steps


def test_consensus_nan_flags_diverged():
    """A NaN in the consensus iteration must surface as diverged=True,
    not masquerade as convergence (round-1 advisor finding)."""
    import jax.numpy as jnp

    from admm_tpu.parallel import consensus_admm

    data = {"scale": jnp.asarray(np.nan)}
    res = consensus_admm(_nan_local, _ok_global, data, 8,
                         ADMMConfig(maxiters=50))
    assert res.diverged
    assert res.steps < 50


def _nan_local(z, ui, rho, d):
    return (z[None, :] - ui) * d["scale"]


def _ok_global(xbar, ubar, rho, W, d):
    return xbar + ubar


def test_consensus_fast_matches_stacked_engine():
    """Fast/accelerated consensus IS the core engine on the stacked
    splitting x = [x_1..x_W], A = I, B = -[I;..;I] (see
    parallel/consensus.py docstring) — the engine run on that
    formulation is the exactness oracle, including the accelerated
    d-value restart/stop trajectory."""
    import jax.numpy as jnp

    from admm_tpu.engine import admm
    from admm_tpu.ops.prox import soft_threshold
    from admm_tpu.parallel import consensus_lasso

    rng = np.random.default_rng(11)
    W, n, m = 4, 12, 64
    D = rng.standard_normal((m, n))
    s = rng.standard_normal(m)
    lam = 0.1 * np.max(np.abs(D.T @ s))
    rho = 1.0

    # Stacked-engine operands mirroring consensus_lasso's per-shard setup.
    Di = D.reshape(W, m // W, n)
    si = s.reshape(W, m // W)
    G = np.einsum("wij,wik->wjk", Di, Di) + rho * np.eye(n)[None]
    Minv = np.linalg.inv(G)
    Dtsi = np.einsum("wij,wi->wj", Di, si)

    def pf(x, z, u, rho_, d=None):
        ui = u.reshape(W, n)
        xi = jnp.einsum("wij,wj->wi", jnp.asarray(Minv),
                        jnp.asarray(Dtsi) + rho_ * (z[None, :] - ui))
        return xi.reshape(W * n)

    def pg(x, z, u, rho_, d=None):
        xbar = jnp.mean(x.reshape(W, n), axis=0)
        ubar = jnp.mean(u.reshape(W, n), axis=0)
        return soft_threshold(xbar + ubar, lam / (rho_ * W))

    Bmat = -np.tile(np.eye(n), (W, 1))

    for variant, compare_steps in (
        (dict(fast=True, fasttype="weak"), True),
        (dict(fast=True, fasttype="strong", domaxiters=True, maxiters=60),
         False),
        (dict(fast=True, fasttype="weak", relax=1.3), True),
    ):
        cfg = ADMMConfig(**{"maxiters": 300, "rho": rho, **variant})
        eng = admm(pf, pg, cfg, A=1.0, B=Bmat, c=0.0,
                   m=W * n, nA=W * n, nB=n,
                   dtype=np.float64)
        con = consensus_lasso(D, s, lam, cfg, nshards=W)
        if compare_steps:
            assert int(con.steps) == int(eng.steps)
            np.testing.assert_allclose(con.dvals, eng.dvals,
                                       rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(con.zopt),
                                   np.asarray(eng.zopt),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(con.xopt),
            np.asarray(eng.xopt).reshape(W, n).mean(axis=0),
            rtol=1e-9, atol=1e-11)


def test_sliced_prox_uneven_slices_match_unsliced():
    """Uneven slicemaker slices (1000 elements over 8 workers -> 125 each,
    via the remainder-spreading rule) wired through make_sliced_prox must
    reproduce the unsliced computation EXACTLY — including a genuinely
    uneven hand-made split (reference admm.m:343-467 +
    errorcheck.m:216-267)."""
    import jax.numpy as jnp

    from admm_tpu.utils.validate import slicemaker

    n = 1000
    mesh = make_mesh()
    lengths = [300, 200, 150, 100, 100, 75, 50, 25]  # deliberately uneven
    assert sum(lengths) == n
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    L = max(lengths)
    starts_dev = jnp.asarray(starts)

    def prox_slice(x, z, u, rho, k):
        lo = starts_dev[k]
        # Fixed-size window; entries past lengths[k] are masked out by
        # the wrapper's gather map.
        seg = jax.lax.dynamic_slice(
            jnp.pad(z - u, (0, L)), (lo,), (L,))
        return seg * rho

    from admm_tpu.parallel import make_sliced_prox

    prox = make_sliced_prox(prox_slice, lengths, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    u = jnp.asarray(rng.standard_normal(n))
    out = np.asarray(prox(x, z, u, 1.7))
    np.testing.assert_array_equal(out, np.asarray(1.7 * (z - u)))

    # And the slicemaker even-split route (0 -> balanced remainder).
    bal = slicemaker(0, n, 8)
    assert bal == [125] * 8
    prox2 = make_sliced_prox(prox_slice_balanced(bal, n), bal, mesh)
    out2 = np.asarray(prox2(x, z, u, 2.0))
    np.testing.assert_array_equal(out2, np.asarray(2.0 * (z - u)))


def prox_slice_balanced(lengths, n):
    import jax.numpy as jnp

    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    L = max(lengths)
    starts_dev = jnp.asarray(starts)

    def prox_slice(x, z, u, rho, k):
        seg = jax.lax.dynamic_slice(
            jnp.pad(z - u, (0, L)), (starts_dev[k],), (L,))
        return seg * rho

    return prox_slice


def test_parallel_both_inside_engine():
    """parallel='both' (admm.m:343-467): BOTH proxes slice-parallel with
    uneven slices, solving the model problem through the jitted engine to
    the closed-form answer."""
    import jax.numpy as jnp

    from admm_tpu import Hooks, admm
    from admm_tpu.ops.solve import SymShiftSolver
    from admm_tpu.parallel import make_parallel_proxes

    rng = np.random.default_rng(6)
    n = 100  # not divisible by 8 -> uneven even-split slices (13x4 + 12x4)
    P = rng.standard_normal((n, n))
    Q = rng.standard_normal((n, n))
    r = rng.standard_normal(n)
    s = rng.standard_normal(n)

    cfg = ADMMConfig(maxiters=5000)
    PtPinv = jnp.asarray(
        SymShiftSolver.from_matrix(P.T @ P).materialize_inverse(cfg.rho))
    QtQinv = jnp.asarray(
        SymShiftSolver.from_matrix(Q.T @ Q).materialize_inverse(cfg.rho))
    Ptr = jnp.asarray(P.T @ r)
    Qts = jnp.asarray(Q.T @ s)

    from admm_tpu.utils.validate import slicemaker

    lengths = slicemaker(0, n, 8)
    assert len(set(lengths)) > 1  # genuinely uneven
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    L = max(lengths)
    starts_dev = jnp.asarray(starts)

    def rows_of(Minv, b, k):
        block = jax.lax.dynamic_slice(
            jnp.pad(Minv, ((0, L), (0, 0))), (starts_dev[k], 0), (L, n))
        return block @ b

    def prox_f_slice(x, z, u, rho, k):
        return rows_of(PtPinv, Ptr + rho * (z - u), k)

    def prox_g_slice(x, z, u, rho, k):
        return rows_of(QtQinv, Qts + rho * (x + u), k)

    prox_f, prox_g = make_parallel_proxes(
        prox_f_slice, prox_g_slice, "both", (lengths, lengths),
        nx=n, nz=n, mesh=make_mesh())

    res = admm(prox_f, prox_g, cfg, A=1.0, B=-1.0, c=0.0, m=n)
    truex = np.linalg.solve(P.T @ P + Q.T @ Q, P.T @ r + Q.T @ s)
    np.testing.assert_allclose(np.asarray(res.xopt), truex, atol=1e-3)


def test_parallel_proxes_validation():
    from admm_tpu.parallel import make_parallel_proxes

    def f(x, z, u, rho, k):
        return x

    with pytest.raises(ValueError, match="xminf"):
        make_parallel_proxes(f, f, "bogus", 0, nx=8, nz=8)
    with pytest.raises(ValueError, match="both"):
        make_parallel_proxes(f, f, "xminf", ([4, 4], [4, 4]), nx=8, nz=8)
    with pytest.raises(ValueError, match="slicesx"):
        make_parallel_proxes(f, f, "both", 0, nx=8, nz=8)


def test_engine_parallel_kwarg():
    """The engine's parallel=/slices= arguments (reference
    options.parallel, admm.m:343-467): per-slice proxes passed straight
    to admm(), uneven slices, identical answer to the serial solve."""
    import jax.numpy as jnp

    from admm_tpu import admm
    from admm_tpu.ops.solve import SymShiftSolver

    rng = np.random.default_rng(9)
    n = 96
    P = rng.standard_normal((n, n))
    Q = rng.standard_normal((n, n))
    r = rng.standard_normal(n)
    s = rng.standard_normal(n)

    cfg = ADMMConfig(maxiters=5000)
    PtPinv = jnp.asarray(
        SymShiftSolver.from_matrix(P.T @ P).materialize_inverse(cfg.rho))
    QtQinv = jnp.asarray(
        SymShiftSolver.from_matrix(Q.T @ Q).materialize_inverse(cfg.rho))
    Ptr, Qts = jnp.asarray(P.T @ r), jnp.asarray(Q.T @ s)

    lengths = [20, 16, 12, 12, 12, 12, 8, 4]
    assert sum(lengths) == n
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    L = max(lengths)
    sd = jnp.asarray(starts)

    def prox_f_slice(x, z, u, rho, k):
        blk = jax.lax.dynamic_slice(
            jnp.pad(PtPinv, ((0, L), (0, 0))), (sd[k], 0), (L, n))
        return blk @ (Ptr + rho * (z - u))

    def prox_g(x, z, u, rho):
        return QtQinv @ (Qts + rho * (x + u))

    res = admm(prox_f_slice, prox_g, cfg, A=1.0, B=-1.0, c=0.0, m=n,
               parallel="xminf", slices=lengths)
    truex = np.linalg.solve(P.T @ P + Q.T @ Q, P.T @ r + Q.T @ s)
    np.testing.assert_allclose(np.asarray(res.xopt), truex, atol=1e-3)

    # data= and parallel= are mutually exclusive (caching contract).
    with pytest.raises(ValueError, match="data"):
        admm(prox_f_slice, prox_g, cfg, A=1.0, B=-1.0, c=0.0, m=n,
             parallel="xminf", slices=lengths, data={"x": jnp.zeros(2)})


def test_consensus_and_sharded_unroll_exact():
    """unroll must be exact for the distributed runners too: same steps
    and same solution as unroll=1."""
    D, s, lam, _ = _lasso_instance(7, 512, 32)
    base = consensus_lasso(D, s, lam, ADMMConfig(maxiters=1001))
    un = consensus_lasso(D, s, lam, ADMMConfig(maxiters=1001, unroll=4))
    assert un.steps == base.steps
    np.testing.assert_array_equal(np.asarray(un.zopt), np.asarray(base.zopt))

    Dsvm, ell = _svm_instance(1, 64, 64, 0.5)
    b2 = linearsvm_sharded(Dsvm, ell, 1.0, ADMMConfig(maxiters=501))
    u2 = linearsvm_sharded(Dsvm, ell, 1.0, ADMMConfig(maxiters=501, unroll=3))
    assert u2.steps == b2.steps
    np.testing.assert_array_equal(np.asarray(u2.xopt), np.asarray(b2.xopt))


def test_engine_parallel_composes_with_unroll():
    """parallel= sliced proxes must compose with unroll (the sliced
    shard_map runs inside the masked unrolled step)."""
    import jax.numpy as jnp

    from admm_tpu import admm
    from admm_tpu.ops.solve import SymShiftSolver

    rng = np.random.default_rng(11)
    n = 64
    P = rng.standard_normal((n, n))
    Q = rng.standard_normal((n, n))
    r = rng.standard_normal(n)
    s = rng.standard_normal(n)

    cfg1 = ADMMConfig(maxiters=3000)
    cfgK = ADMMConfig(maxiters=3000, unroll=4)
    PtPinv = jnp.asarray(
        SymShiftSolver.from_matrix(P.T @ P).materialize_inverse(cfg1.rho))
    QtQinv = jnp.asarray(
        SymShiftSolver.from_matrix(Q.T @ Q).materialize_inverse(cfg1.rho))
    Ptr, Qts = jnp.asarray(P.T @ r), jnp.asarray(Q.T @ s)
    slice_len = n // 8

    def prox_f_slice(x, z, u, rho, k):
        rows = jax.lax.dynamic_slice_in_dim(PtPinv, k * slice_len, slice_len, 0)
        return rows @ (Ptr + rho * (z - u))

    def prox_g(x, z, u, rho):
        return QtQinv @ (Qts + rho * (x + u))

    r1 = admm(prox_f_slice, prox_g, cfg1, A=1.0, B=-1.0, c=0.0, m=n,
              parallel="xminf", slices=slice_len)
    rK = admm(prox_f_slice, prox_g, cfgK, A=1.0, B=-1.0, c=0.0, m=n,
              parallel="xminf", slices=slice_len)
    assert rK.steps == r1.steps
    np.testing.assert_array_equal(np.asarray(rK.xopt), np.asarray(r1.xopt))

    # And with engine variants: the sliced wrapper is a pure prox
    # decomposition, so fast/accelerated momentum must compose exactly
    # with parallel= — same steps and iterates as the unsliced solve
    # (reference: the parfor wrappers sit inside the same engine loop,
    # admm.m:416-467 within 496-743).
    def prox_f_full(x, z, u, rho):
        return PtPinv @ (Ptr + rho * (z - u))

    cfg_fast = ADMMConfig(maxiters=3000, fast=True)
    rf_sliced = admm(prox_f_slice, prox_g, cfg_fast, A=1.0, B=-1.0, c=0.0,
                     m=n, parallel="xminf", slices=slice_len)
    rf_plain = admm(prox_f_full, prox_g, cfg_fast, A=1.0, B=-1.0, c=0.0,
                    m=n, nA=n, nB=n)
    assert rf_sliced.steps == rf_plain.steps
    np.testing.assert_allclose(np.asarray(rf_sliced.xopt),
                               np.asarray(rf_plain.xopt),
                               rtol=1e-12, atol=1e-13)


def _svm_variant_problem(seed=0, m=96, n=10):
    import numpy as np

    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n))
    ell = np.sign(rng.standard_normal(m))
    x0 = rng.uniform(size=n)
    z0 = rng.uniform(size=m)
    u0 = rng.uniform(size=m)
    return D, ell, x0, z0, u0


@pytest.mark.parametrize("variant", [
    dict(),                                  # plain
    dict(relax=1.5),                         # over-relaxation
    # alg 1 on a hinge is non-contractive (no strong convexity), so
    # serial/sharded rounding differences amplify ~e^{0.23 i}: compare a
    # bounded horizon where f64 trajectories are still locked together.
    dict(fast=True, fasttype="strong", maxiters=100, domaxiters=True),
    dict(fast=True, fasttype="weak"),        # alg 2 + restart + d-stop
    dict(stopcond="both", convtest=True),    # H-norm machinery active
])
def test_sharded_unwrapped_matches_serial_per_variant(variant):
    # In the reference, unwrappedadmm passes options straight to admm
    # (unwrappedadmm.m:94), so every engine variant applies on its
    # parallel path; the sharded runner must reproduce the serial
    # trajectory exactly (same warm start, f64).
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.models.linearsvm import linearsvm
    from admm_tpu.parallel import linearsvm_sharded

    D, ell, x0, z0, u0 = _svm_variant_problem()
    cfg = ADMMConfig(**{"maxiters": 400, **variant})
    serial = linearsvm(D, ell, 0.7, cfg, x0=x0, z0=z0, u0=u0)
    sharded = linearsvm_sharded(D, ell, 0.7, cfg, nshards=4,
                                x0=x0, z0=z0, u0=u0)
    assert int(sharded.steps) == int(serial.steps)
    np.testing.assert_allclose(np.asarray(sharded.xopt),
                               np.asarray(serial.xopt),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(sharded.pnorm, serial.pnorm,
                               rtol=1e-6, atol=1e-9)


def test_sharded_unwrapped_dual_stop_and_rbadaptive_match_serial():
    # nodualerror=False engages the dual Boyd test (admm.m:639-658) and
    # makes rbadaptive's residual balancing live; the sharded runner must
    # track the serial engine's rho trajectory and stopping decision.
    # (linearsvm forces nodualerror per the reference driver, so drive
    # the generic unwrapped pair directly with an explicit override.)
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.models.linearsvm import _obj_hinge, _prox_g_hinge
    from admm_tpu.models.unwrapped import unwrappedadmm
    from admm_tpu.parallel.transpose_reduction import (
        _svm_obj_hinge, _svm_obj_global, _svm_prox_hinge,
        unwrapped_admm_sharded)

    D, ell, x0, z0, u0 = _svm_variant_problem(seed=3)
    C = 0.7
    cfg = ADMMConfig(maxiters=400, stopcond="both", rbadaptive=True)
    serial = unwrappedadmm(
        _prox_g_hinge, D, cfg, obj=_obj_hinge,
        data={"D": np.asarray(D), "ell": np.asarray(ell),
              "C": np.float64(C)},
        x0=x0, z0=z0, u0=u0, nodualerror=False)
    import dataclasses
    sh_cfg = dataclasses.replace(cfg, nodualerror=False)
    sharded = unwrapped_admm_sharded(
        _svm_prox_hinge, D, sh_cfg,
        aux=(ell, np.ones_like(ell), np.full_like(ell, C)),
        obj_shard=_svm_obj_hinge, obj_global=_svm_obj_global,
        nshards=4, x0=x0, z0=z0, u0=u0)
    assert int(sharded.steps) == int(serial.steps)
    assert sharded.rho_final == pytest.approx(serial.rho_final, rel=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.xopt),
                               np.asarray(serial.xopt),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(sharded.dnorm, serial.dnorm,
                               rtol=1e-6, atol=1e-9)


def test_sharded_unwrapped_results_accessors_and_validation():
    # dnorm/derr accessors must work under nodualerror (NaN traces, like
    # the serial engine), and mis-sized warm starts must raise instead of
    # being silently zero-padded.
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import linearsvm_sharded

    D, ell, x0, z0, u0 = _svm_variant_problem(seed=7)
    res = linearsvm_sharded(D, ell, 0.7, ADMMConfig(maxiters=50), nshards=4)
    assert np.isnan(res.dnorm).all() and np.isnan(res.derr).all()
    for kw in (dict(x0=x0[:-1]), dict(z0=z0[:-1]), dict(u0=u0[:-1])):
        with pytest.raises(ValueError, match="must have shape"):
            linearsvm_sharded(D, ell, 0.7, ADMMConfig(maxiters=10),
                              nshards=4, **kw)


def test_sharded_unwrapped_unroll_is_exact():
    # unrolled_body must mask discarded sub-steps over the new dict
    # carry (momentum + rho + hist) bit-for-bit.
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import linearsvm_sharded

    D, ell, x0, z0, u0 = _svm_variant_problem(seed=5)
    kw = dict(nshards=4, x0=x0, z0=z0, u0=u0)
    for variant in (dict(), dict(fast=True, fasttype="weak")):
        r1 = linearsvm_sharded(D, ell, 0.7,
                               ADMMConfig(maxiters=150, **variant), **kw)
        r4 = linearsvm_sharded(D, ell, 0.7,
                               ADMMConfig(maxiters=150, unroll=4, **variant),
                               **kw)
        assert int(r4.steps) == int(r1.steps)
        np.testing.assert_array_equal(np.asarray(r4.xopt),
                                      np.asarray(r1.xopt))


def test_linearsvm_wrapper_parallel_routes_to_sharded():
    # options.parallel parity on the SVM wrapper (linearsvm.m:169-206):
    # linearsvm(parallel=True) must produce the sharded runner's exact
    # solve (same warm start).
    from admm_tpu import ADMMConfig, linearsvm
    from admm_tpu.parallel import linearsvm_sharded

    D, ell, x0, z0, u0 = _svm_variant_problem(seed=9)
    cfg = ADMMConfig(maxiters=200)
    kw = dict(x0=x0, z0=z0, u0=u0)
    via_wrapper = linearsvm(D, ell, 0.7, cfg, parallel=True, nshards=4, **kw)
    direct = linearsvm_sharded(D, ell, 0.7, cfg, nshards=4, **kw)
    assert int(via_wrapper.steps) == int(direct.steps)
    np.testing.assert_array_equal(np.asarray(via_wrapper.xopt),
                                  np.asarray(direct.xopt))


def test_lasso_wrapper_parallel_routes_to_consensus():
    # The reference wrapper's options.parallel (lasso.m:148-150) is
    # exposed as lasso(parallel=True): same solve as consensus_lasso.
    from admm_tpu import ADMMConfig, lasso
    from admm_tpu.parallel import consensus_lasso

    D, s, lam, _ = _lasso_instance(3, 96, 12)
    cfg = ADMMConfig(maxiters=300)
    via_wrapper = lasso(D, s, lam, cfg, parallel=True, nshards=4)
    direct = consensus_lasso(D, s, lam, cfg, nshards=4)
    assert int(via_wrapper.steps) == int(direct.steps)
    np.testing.assert_array_equal(np.asarray(via_wrapper.zopt),
                                  np.asarray(direct.zopt))
    with pytest.raises(ValueError, match="per-shard"):
        lasso(D, s, lam, cfg, parallel=True, nshards=4, x0=np.zeros(12))


def test_sharded_runners_record_iterates():
    # record_iterates parity on the sharded paths: the reference's
    # parallel solves record per-iteration state through its engine
    # (admm.m:607-610).  Consensus traces the aggregates xbar/z/ubar/w;
    # transpose reduction traces the replicated x.
    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso, linearsvm_sharded

    D, s, lam, _ = _lasso_instance(5, 96, 12)
    cfg = ADMMConfig(maxiters=100, record_iterates=True)
    res = consensus_lasso(D, s, lam, cfg, nshards=4)
    k = int(res.steps)
    assert res.hist["xvals"].shape == (100, 12)
    assert res.hist["wvals"].shape == (100, 36)
    np.testing.assert_array_equal(np.asarray(res.hist["xvals"][k - 1]),
                                  np.asarray(res.xopt))
    np.testing.assert_array_equal(np.asarray(res.hist["zvals"][k - 1]),
                                  np.asarray(res.zopt))

    ell = np.sign(np.asarray(s))
    res2 = linearsvm_sharded(D, ell, 0.7, cfg, nshards=4)
    k2 = int(res2.steps)
    np.testing.assert_array_equal(np.asarray(res2.hist["xvals"][k2 - 1]),
                                  np.asarray(res2.xopt))

    # Under rbadaptive the recorded dual must be the POST-rescale one
    # (engine parity): uvals[k-1] == uopt exactly, and wvals preserves
    # the scaled-dual product via rho_new.
    cfg_rb = ADMMConfig(maxiters=40, domaxiters=True, rbadaptive=True,
                        record_iterates=True)
    res3 = consensus_lasso(D, s, lam, cfg_rb, nshards=4)
    k3 = int(res3.steps)
    # mean(ui)/factor vs mean(ui/factor): identical up to rounding.
    np.testing.assert_allclose(np.asarray(res3.hist["uvals"][k3 - 1]),
                               np.asarray(res3.uopt),
                               rtol=1e-12, atol=1e-15)

    # Fast consensus records the z-space predictor trace.
    cfg_f = ADMMConfig(maxiters=40, domaxiters=True, fast=True,
                       record_iterates=True)
    res4 = consensus_lasso(D, s, lam, cfg_f, nshards=4)
    assert res4.hist["vvals"].shape == (40, 12)


def test_consensus_lasso_setup_is_cached_across_solves():
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso
    from admm_tpu.parallel.consensus import _cached_lasso_setup

    rng = np.random.default_rng(1)
    D = rng.standard_normal((64, 8)).astype(np.float32)
    s = rng.standard_normal(64).astype(np.float32)
    cfg = ADMMConfig(maxiters=30)
    consensus_lasso(D, s, 0.1, cfg, nshards=4)
    before = _cached_lasso_setup.cache_info().hits
    consensus_lasso(D, s + 0.1, 0.1, cfg, nshards=4)
    assert _cached_lasso_setup.cache_info().hits == before + 1


# ---- 2-D mesh: instance lanes x consensus shards (round 4) ----------------


def test_consensus_lasso_batch_lane_exact_2d_mesh():
    """consensus_lasso_batch over a 2x4 (lanes x shards) mesh must equal
    the 1-D 4-shard consensus solve lane for lane — same step counts,
    same solutions (f64)."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import (consensus_lasso, consensus_lasso_batch,
                                   make_mesh, make_mesh2d)

    rng = np.random.default_rng(5)
    m, n, B = 64, 10, 4
    D = rng.standard_normal((m, n))
    S = rng.standard_normal((B, m))
    lams = np.geomspace(0.05, 0.4, B)
    cfg = ADMMConfig(maxiters=500)
    batch = consensus_lasso_batch(D, S, lams, cfg, mesh=make_mesh2d(2, 4))
    sub = make_mesh(4)
    for b in range(B):
        solo = consensus_lasso(D, S[b], float(lams[b]), cfg, mesh=sub,
                               nshards=4)
        assert int(np.asarray(batch.steps)[b]) == int(solo.steps)
        np.testing.assert_allclose(np.asarray(batch.zopt)[b],
                                   np.asarray(solo.zopt),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(batch.xopt)[b],
                                   np.asarray(solo.xopt),
                                   rtol=1e-10, atol=1e-12)
    # per-lane residual histories recorded
    assert batch.hist["pnorm"].shape == (B, cfg.maxiters)


def test_consensus_lasso_batch_dynamic_rho_and_validation():
    import numpy as np
    import pytest as _pytest

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso_batch, make_mesh, make_mesh2d

    rng = np.random.default_rng(6)
    D = rng.standard_normal((48, 8))
    S = rng.standard_normal((4, 48))

    # rbadaptive engages the batched-eigh (rho-parameterized) local solve.
    res = consensus_lasso_batch(D, S, 0.1,
                                ADMMConfig(maxiters=200, rbadaptive=True),
                                mesh=make_mesh2d(2, 2))
    assert np.isfinite(np.asarray(res.zopt)).all()
    assert np.asarray(res.steps).shape == (4,)

    with _pytest.raises(ValueError, match="2-D"):
        consensus_lasso_batch(D, S, 0.1, mesh=make_mesh(4))
    with _pytest.raises(ValueError, match="divide over"):
        consensus_lasso_batch(D, S[:3], 0.1, mesh=make_mesh2d(2, 2))
    with _pytest.raises(ValueError, match="signal lanes"):
        consensus_lasso_batch(D, S[:, :20], 0.1, mesh=make_mesh2d(2, 2))


def test_consensus_lasso_batch_warm_start_resumes():
    """Resume from extra['xi']/['ui'] + zopt: the continued solve picks
    up near the converged state (few steps, same solution)."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso_batch, make_mesh2d

    rng = np.random.default_rng(8)
    D = rng.standard_normal((48, 8))
    S = rng.standard_normal((4, 48))
    mesh = make_mesh2d(2, 2)
    cfg = ADMMConfig(maxiters=400)
    full = consensus_lasso_batch(D, S, 0.2, cfg, mesh=mesh)
    resumed = consensus_lasso_batch(
        D, S, 0.2, cfg, mesh=mesh,
        xi0=full.extra["xi"], ui0=full.extra["ui"], z0=full.zopt)
    assert int(np.asarray(resumed.steps).max()) <= 3
    # The resumed solve may take 1-2 polishing steps, so compare at the
    # stopping tolerance, not bit-exactly.
    np.testing.assert_allclose(np.asarray(resumed.zopt),
                               np.asarray(full.zopt), atol=1e-3)
    for b in range(4):
        obj = lambda z: (0.5 * np.sum((D @ z - S[b]) ** 2)
                         + 0.2 * np.sum(np.abs(z)))
        zf, zr = np.asarray(full.zopt)[b], np.asarray(resumed.zopt)[b]
        assert abs(obj(zr) - obj(zf)) <= 1e-4 * (1.0 + abs(obj(zf)))


def test_consensus_elasticnet_batch_2d_mesh():
    """Second instantiation of the batched consensus core: alphas=1
    recovers consensus_lasso_batch exactly; alphas<1 matches the 1-D
    consensus_elasticnet lane for lane."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import (consensus_elasticnet,
                                   consensus_elasticnet_batch,
                                   consensus_lasso_batch, make_mesh,
                                   make_mesh2d)

    rng = np.random.default_rng(10)
    D = rng.standard_normal((48, 8))
    S = rng.standard_normal((4, 48))
    lams = np.geomspace(0.05, 0.3, 4)
    mesh = make_mesh2d(2, 2)
    cfg = ADMMConfig(maxiters=400)

    en1 = consensus_elasticnet_batch(D, S, lams, 1.0, cfg, mesh=mesh)
    la = consensus_lasso_batch(D, S, lams, cfg, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(en1.steps), np.asarray(la.steps))
    np.testing.assert_allclose(np.asarray(en1.zopt), np.asarray(la.zopt),
                               rtol=1e-12, atol=1e-14)

    alphas = np.array([0.3, 0.6, 0.8, 1.0])
    enb = consensus_elasticnet_batch(D, S, lams, alphas, cfg, mesh=mesh)
    sub = make_mesh(2)
    for b in range(4):
        solo = consensus_elasticnet(D, S[b], float(lams[b]),
                                    float(alphas[b]), cfg, mesh=sub,
                                    nshards=2)
        assert int(np.asarray(enb.steps)[b]) == int(solo.steps)
        np.testing.assert_allclose(np.asarray(enb.zopt)[b],
                                   np.asarray(solo.zopt),
                                   rtol=1e-10, atol=1e-12)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alphas"):
        consensus_elasticnet_batch(D, S, lams, 1.5, cfg, mesh=mesh)


def test_sharded_runners_stall_detector():
    """The plateau detector (ADMMConfig.stallwindow) reaches both sharded
    programs: an f32 solve with f64-grade tolerances floors above the
    Boyd gate and must stall-stop instead of burning the budget."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso, linearsvm_sharded

    rng = np.random.default_rng(12)
    D = rng.standard_normal((128, 16)).astype(np.float32)
    s = rng.standard_normal(128).astype(np.float32)
    kw = dict(maxiters=3000, abstol=1e-13, reltol=1e-13)

    res = consensus_lasso(D, s, 0.1, ADMMConfig(stallwindow=50, **kw),
                          nshards=4)
    assert res.stalled and res.steps < 3000

    from admm_tpu.testers.problems import make_svm_instance

    Ds, ell = make_svm_instance(0, 64, 64, 0.5)
    # nodualerror is forced by the SVM driver; the dual-less standard
    # stop at these tolerances is unreachable at f32.
    rs = linearsvm_sharded(Ds.astype(np.float32), ell.astype(np.float32),
                           1.0, ADMMConfig(stallwindow=50, stopcond="both",
                                           hnormtol=1e-30, **kw), nshards=4)
    assert rs.stalled and rs.steps < 3000
    # And inert on a healthy f64 solve.
    ok = consensus_lasso(np.asarray(D, np.float64), np.asarray(s, np.float64),
                         0.1, ADMMConfig(maxiters=3000, stallwindow=200),
                         nshards=4)
    assert not ok.stalled and ok.steps < 3000


def test_svm_batch_sharded_lane_exact_2d_mesh():
    """One-vs-all lanes x row shards (svm_batch_sharded): from identical
    warm starts each lane must reproduce linearsvm_sharded exactly; the
    random per-lane starts must give distinct lanes that still solve."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import (linearsvm_sharded, make_mesh,
                                   make_mesh2d, svm_batch_sharded)
    from admm_tpu.testers.problems import make_svm_instance

    D, _ = make_svm_instance(0, 96, 96, 0.5)
    rng = np.random.default_rng(3)
    y = rng.integers(0, 4, size=D.shape[0])
    ells = np.stack([np.where(y == k, 1.0, -1.0) for k in range(4)])
    cfg = ADMMConfig(maxiters=300)
    mesh = make_mesh2d(2, 4)
    x0 = rng.random((4, 2))
    z0 = rng.random((4, D.shape[0]))
    u0 = rng.random((4, D.shape[0]))
    batch = svm_batch_sharded(D, ells, 1.0, cfg, mesh=mesh, nshards=4,
                              x0=x0, z0=z0, u0=u0)
    sub = make_mesh(4)
    for b in range(4):
        solo = linearsvm_sharded(D, ells[b], 1.0, cfg, mesh=sub, nshards=4,
                                 x0=x0[b], z0=z0[b], u0=u0[b])
        assert int(np.asarray(batch.steps)[b]) == int(solo.steps)
        np.testing.assert_allclose(np.asarray(batch.xopt)[b],
                                   np.asarray(solo.xopt),
                                   rtol=1e-9, atol=1e-11)
    # Default per-lane seeded starts: distinct lanes, finite solves.
    b2 = svm_batch_sharded(D, ells, 1.0, cfg, mesh=mesh, nshards=4)
    x = np.asarray(b2.xopt)
    assert np.isfinite(x).all() and x.shape == (4, 2)
    assert not np.allclose(x[0], x[1])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="2-D"):
        svm_batch_sharded(D, ells, 1.0, cfg, mesh=make_mesh(4))
    with _pytest.raises(ValueError, match="label lanes"):
        svm_batch_sharded(D, ells[:, :10], 1.0, cfg, mesh=mesh)
