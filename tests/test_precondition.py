"""Ruiz equilibration (ops/scaling.py; linearprogram / quadraticprogram
``precondition=True``).

No reference analog (the reference's testers generate well-scaled data
only).  Oracle pattern: take a well-scaled instance with a trusted
solution x*, build its badly scaled re-parameterization (row scales G,
column scales F — whose exact solution is F⁻¹x* by substitution), and
require the preconditioned solve to recover it where the plain solve
degrades.
"""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, linearprogram, quadraticprogram
from admm_tpu.ops.scaling import kkt_scale_quality, ruiz_equilibrate


def _bad_scales(rng, m, n, spread=2.0):
    G = 10.0 ** rng.uniform(-spread, spread, m)
    F = 10.0 ** rng.uniform(-spread, spread, n)
    return G, F


def test_ruiz_equilibrates_kkt(rng):
    m, n = 40, 90
    G, F = _bad_scales(rng, m, n, 3.0)
    D = G[:, None] * rng.standard_normal((m, n)) * F[None, :]
    P = rng.standard_normal((n, n))
    P = P @ P.T + np.eye(n)
    P = F[:, None] * P * F[None, :]
    before = kkt_scale_quality(D, P)
    e, r = ruiz_equilibrate(D, P)
    after = kkt_scale_quality(D, P, e, r)
    assert before > 1e3
    assert after < 2.0  # Ruiz converges to ~unit rows/cols


def test_ruiz_p_only():
    P = np.diag([1e-4, 1.0, 1e4])
    e, r = ruiz_equilibrate(None, P)
    assert r.size == 0
    q = kkt_scale_quality(np.zeros((0, 3)), P, e)
    assert q < 1.5


def _lp_instance(rng, m=40, n=120):
    D = rng.standard_normal((m, n))
    xt = np.abs(rng.standard_normal(n))
    s = D @ xt
    b = np.abs(rng.standard_normal(n)) + 0.1
    return b, D, s


TIGHT = dict(abstol=1e-8, reltol=1e-8, maxiters=60000)


def test_lp_preconditioned_matches_reparameterized_oracle(rng):
    b, D, s = _lp_instance(rng)
    m, n = D.shape
    ref = linearprogram(b, D, s, ADMMConfig(**TIGHT))
    assert int(ref.steps) < TIGHT["maxiters"]
    xstar = np.asarray(ref.xopt)

    G, F = _bad_scales(rng, m, n)
    Dbad = G[:, None] * D * F[None, :]
    sbad = G * s
    bbad = F * b
    # Exact solution of the bad problem: y* = F^{-1} x*... NO — with
    # y = F^{-1} x the bad objective is (Fb)ᵀy = bᵀx, so y* = x*/F.
    ystar = xstar / F

    cfg = ADMMConfig(abstol=1e-8, reltol=1e-8, maxiters=40000)
    res_pre = linearprogram(bbad, Dbad, sbad, cfg, precondition=True)
    res_plain = linearprogram(bbad, Dbad, sbad, cfg)

    fstar = float(b @ xstar)
    f_pre = float(bbad @ np.asarray(res_pre.xopt))
    assert abs(f_pre - fstar) <= 1e-5 * (1.0 + abs(fstar))
    np.testing.assert_allclose(np.asarray(res_pre.xopt), ystar,
                               rtol=1e-3, atol=1e-5 * np.max(np.abs(ystar)))
    # The badly scaled problem must be HARD unpreconditioned (cap burn
    # or a worse objective) and easy preconditioned.
    f_plain = float(bbad @ np.asarray(res_plain.xopt))
    plain_bad = (int(res_plain.steps) >= cfg.maxiters
                 or abs(f_plain - fstar) > 1e2 * abs(f_pre - fstar))
    assert int(res_pre.steps) < int(res_plain.steps) or plain_bad
    assert "ruiz_col" in res_pre.extra


def test_qp_standard_preconditioned(rng):
    m, n = 30, 80
    A0 = rng.standard_normal((n, n))
    P = A0 @ A0.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    D = rng.standard_normal((m, n))
    xt = np.abs(rng.standard_normal(n))
    s = D @ xt
    ref = quadraticprogram(P, q, 0.0, D, s, ADMMConfig(**TIGHT))
    assert int(ref.steps) < TIGHT["maxiters"]
    xstar = np.asarray(ref.xopt)
    fstar = 0.5 * xstar @ P @ xstar + q @ xstar

    G, F = _bad_scales(rng, m, n)
    Pb = F[:, None] * P * F[None, :]
    qb = F * q
    Db = G[:, None] * D * F[None, :]
    sb = G * s
    cfg = ADMMConfig(abstol=1e-8, reltol=1e-8, maxiters=40000)
    res = quadraticprogram(Pb, qb, 0.0, Db, sb, cfg, precondition=True)
    y = np.asarray(res.xopt)
    fb = 0.5 * y @ Pb @ y + qb @ y  # invariant objective value
    assert abs(fb - fstar) <= 1e-5 * (1.0 + abs(fstar))
    np.testing.assert_allclose(y, xstar / F, rtol=1e-3,
                               atol=1e-5 * np.max(np.abs(xstar / F)))


def test_qp_bounded_preconditioned(rng):
    n = 60
    A0 = rng.standard_normal((n, n))
    P = A0 @ A0.T + np.eye(n)
    q = rng.standard_normal(n)
    lb, ub = -0.2 * np.ones(n), 0.2 * np.ones(n)
    ref = quadraticprogram(P, q, 0.0, lb, ub, ADMMConfig(**TIGHT))
    xstar = np.asarray(ref.xopt)

    F = 10.0 ** rng.uniform(-2, 2, n)
    Pb = F[:, None] * P * F[None, :]
    qb = F * q
    res = quadraticprogram(Pb, qb, 0.0, lb / F, ub / F,
                           ADMMConfig(abstol=1e-8, reltol=1e-8,
                                      maxiters=40000),
                           precondition=True)
    y = np.asarray(res.xopt)
    np.testing.assert_allclose(F * y, xstar, rtol=1e-4, atol=1e-6)
    assert res.extra["ruiz_row"] is None


def test_precondition_composes_with_anderson(rng):
    b, D, s = _lp_instance(rng, 30, 90)
    G, F = _bad_scales(rng, 30, 90)
    res = linearprogram(F * b, G[:, None] * D * F[None, :], G * s,
                        ADMMConfig(abstol=1e-8, reltol=1e-8,
                                   maxiters=40000, anderson=10),
                        precondition=True)
    ref = linearprogram(b, D, s, ADMMConfig(**TIGHT))
    f0 = float(b @ np.asarray(ref.xopt))
    f1 = float((F * b) @ np.asarray(res.xopt))
    assert abs(f1 - f0) <= 1e-5 * (1.0 + abs(f0))


def test_dual_unscaling_direction(rng):
    # The scaled dual transforms as ũ = e·u (∂g̃(x̃) = E ∂g(x)), so the
    # returned uopt must be ũ/e — a review pass caught the inverted
    # direction (off by e² per coordinate).  Oracle: on a MODERATELY
    # scaled instance both the plain and preconditioned solves
    # converge, and their duals must agree.
    b, D, s = _lp_instance(rng, 30, 90)
    G, F = _bad_scales(rng, 30, 90, 1.0)  # mild: plain still converges
    Db, sb, bb = G[:, None] * D * F, G * s, F * b
    cfg = ADMMConfig(abstol=1e-9, reltol=1e-9, maxiters=60000)
    rp = linearprogram(bb, Db, sb, cfg)
    rpre = linearprogram(bb, Db, sb, cfg, precondition=True)
    up = np.asarray(rp.uopt)
    upre = np.asarray(rpre.uopt)
    scale = np.max(np.abs(up))
    # LP duals at active-set boundaries converge slower than primals,
    # so agreement is convergence-noise loose (measured ~0.5% at
    # 1e-10 tolerances; the INVERTED direction reads ~100%+ off and
    # scales with the e² spread — that's what this test pins).
    np.testing.assert_allclose(upre, up, rtol=5e-2, atol=1e-2 * scale)

    # Warm-starting the preconditioned solve from its own solution must
    # reconverge near-instantly (the round-trip exercises the u0
    # scaling direction too).
    rws = linearprogram(bb, Db, sb, cfg, precondition=True,
                        x0=np.asarray(rpre.xopt), z0=np.asarray(rpre.zopt),
                        u0=np.asarray(rpre.uopt))
    assert int(rws.steps) <= max(5, 0.02 * int(rpre.steps))


def test_bad_scaling_warning(rng):
    # Badly scaled data without precondition=True warns once; well
    # scaled data and preconditioned solves stay silent.
    import warnings

    b, D, s = _lp_instance(rng, 20, 60)
    G, F = _bad_scales(rng, 20, 60, 3.0)
    cfg = ADMMConfig(maxiters=50)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        linearprogram(F * b, G[:, None] * D * F, G * s, cfg)
        assert any("badly scaled" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        linearprogram(b, D, s, cfg)
        linearprogram(F * b, G[:, None] * D * F, G * s, cfg,
                      precondition=True)
        assert not any("badly scaled" in str(x.message) for x in w)


def test_well_scaled_noop_quality(rng):
    # Preconditioning a well-scaled problem must not hurt the answer.
    b, D, s = _lp_instance(rng, 20, 60)
    cfg = ADMMConfig(abstol=1e-8, reltol=1e-8, maxiters=60000)
    r0 = linearprogram(b, D, s, cfg)
    r1 = linearprogram(b, D, s, cfg, precondition=True)
    f0 = float(b @ np.asarray(r0.xopt))
    f1 = float(b @ np.asarray(r1.xopt))
    assert abs(f1 - f0) <= 1e-6 * (1.0 + abs(f0))
