"""Config-matrix fuzz: random valid ADMMConfig combinations through a
small solve must either converge (finite state, steps within budget) or
flag divergence cleanly — never crash at trace time or return silent
NaNs.  The engine selects every variant branch at trace time from the
static config (engine.py docstring), so this sweeps the cross-product of
those branches the targeted per-variant tests don't enumerate.
"""

import numpy as np
import pytest

from admm_tpu import ADMMConfig, lasso
from admm_tpu.models.model import model


def _random_config(rng, aa_ok=True):
    cfg = dict(
        rho=float(rng.choice([0.5, 1.0, 2.0])),
        maxiters=int(rng.choice([60, 150])),
        relax=float(rng.choice([1.0, 1.0, 0.7, 1.5])),
        unroll=int(rng.choice([1, 1, 3, 4])),
        nanguard=bool(rng.random() < 0.5),
        domaxiters=bool(rng.random() < 0.2),
        # Plateau detector (round 4): off / on with a small window —
        # must compose with every variant branch without crashing.
        stallwindow=int(rng.choice([0, 0, 0, 30])),
        quiet=True,
    )
    modes = ["plain", "fast_w", "fast_s", "adaptive", "rb"]
    if aa_ok:  # AA: core engine + consensus runner (exchange/TR reject it)
        modes.append("aa")
    mode = rng.choice(modes)
    if mode == "fast_w":
        cfg.update(fast=True, fasttype="weak")
    elif mode == "fast_s":
        cfg.update(fast=True, fasttype="strong")
    elif mode == "adaptive":
        cfg.update(adaptive=True, convtest=True)
    elif mode == "rb":
        # rbadaptive excludes fast/adaptive/nodualerror (config rules).
        cfg.update(rbadaptive=True)
    elif mode == "aa":
        # Anderson acceleration: standard iteration + standard stop only
        # (config rules); sweep window sizes incl. one larger than the
        # tiny maxiters would ever fill.
        cfg.update(anderson=int(rng.choice([2, 5, 12])))
    cfg["stopcond"] = str(rng.choice(
        ["standard", "both"] + (["hnorm"] if mode != "fast_w" else []))
    ) if mode != "aa" else "standard"
    if mode in ("adaptive",):
        cfg["stopcond"] = "both"  # adaptive needs the H machinery anyway
    return ADMMConfig(**cfg)


@pytest.mark.parametrize("trial", range(24))
def test_random_config_never_crashes_or_lies(trial):
    rng = np.random.default_rng(1000 + trial)
    cfg = _random_config(rng)
    D = rng.standard_normal((48, 24))
    s = rng.standard_normal(48)
    res = lasso(D, s, 0.15, cfg)
    assert 1 <= int(res.steps) <= cfg.maxiters
    x = np.asarray(res.xopt)
    # Either a clean solve (finite everywhere) or an explicit divergence
    # flag — silent NaNs are the failure mode this test exists to catch.
    assert bool(res.diverged) or np.all(np.isfinite(x))
    if cfg.domaxiters and not res.diverged and cfg.alg != 2:
        # domaxiters must run the full budget (the alg-2 d-value stop
        # deliberately ignores it, admm.m:706-707).
        assert int(res.steps) == cfg.maxiters


@pytest.mark.parametrize("trial", range(8))
def test_random_config_two_prox_problem(trial):
    # Same sweep through the two-quadratic 'model' problem: exercises the
    # dual/H machinery with a nontrivial B-side prox.
    rng = np.random.default_rng(2000 + trial)
    cfg = _random_config(rng)
    P = rng.standard_normal((40, 20))
    Q = rng.standard_normal((40, 20))
    r = rng.standard_normal(40)
    s = rng.standard_normal(40)
    res = model(P, Q, r, s, cfg)
    assert 1 <= int(res.steps) <= cfg.maxiters
    assert bool(res.diverged) or np.all(np.isfinite(np.asarray(res.xopt)))


@pytest.mark.parametrize("trial", range(12))
def test_random_config_new_families_never_crash(trial):
    """Round-3 families (quantile / rpca / fusedlasso) through the same
    random-config sweep: converge cleanly or flag divergence, never
    crash at trace time or return silent NaNs."""
    from admm_tpu import fusedlasso, quantile, rpca

    rng = np.random.default_rng(2000 + trial)
    cfg = _random_config(rng)
    fam = ("quantile", "rpca", "fusedlasso")[trial % 3]
    if fam == "quantile":
        D = rng.standard_normal((48, 12))
        s = rng.standard_normal(48)
        res = quantile(D, s, float(rng.choice([0.3, 0.5, 0.8])), cfg)
    elif fam == "rpca":
        L0 = rng.standard_normal((20, 3)) @ rng.standard_normal((3, 16))
        S0 = (rng.random((20, 16)) < 0.05) * rng.standard_normal((20, 16))
        res = rpca(L0 + S0, config=cfg)
    else:
        sig = np.repeat(rng.standard_normal(4), 12) \
            + 0.3 * rng.standard_normal(48)
        res = fusedlasso(sig, 0.2, 0.4, cfg)
    assert 1 <= int(res.steps) <= cfg.maxiters
    x = np.asarray(res.xopt)
    assert bool(res.diverged) or np.all(np.isfinite(x))


@pytest.mark.parametrize("trial", range(8))
def test_random_config_consensus_never_crashes_or_lies(trial):
    """The consensus runner traces the same variant cross-product as the
    engine; random valid configs through a sharded solve must converge
    cleanly or flag divergence/stall — never crash or return silent
    NaNs."""
    from admm_tpu.parallel import consensus_lasso

    rng = np.random.default_rng(2000 + trial)
    cfg = _random_config(rng)
    D = rng.standard_normal((64, 12))
    s = rng.standard_normal(64)
    res = consensus_lasso(D, s, 0.1, cfg, nshards=4)
    assert 1 <= int(res.steps) <= cfg.maxiters
    z = np.asarray(res.zopt)
    assert bool(res.diverged) or np.all(np.isfinite(z))
    if cfg.domaxiters and not res.diverged and cfg.alg != 2:
        assert int(res.steps) == cfg.maxiters


@pytest.mark.parametrize("trial", range(8))
def test_random_config_round4_families_never_crash(trial):
    """Round-4 families (sdp / exchange) through the random-config
    sweep.  The exchange runner only consumes the plain-branch knobs
    (unroll/stall/rb/domaxiters); sdp goes through the full engine."""
    from admm_tpu import sdp
    from admm_tpu.models.sdp import random_sdp_instance
    from admm_tpu.parallel import exchange_quadratic

    rng = np.random.default_rng(4000 + trial)
    # sdp rides the full engine and exchange carries its own AA state
    # (round-5 late), so the aa mode sweeps both.
    cfg = _random_config(rng)
    if trial % 2 == 0:
        C, A, b, *_ = random_sdp_instance(8, 5, 3,
                                          np.random.default_rng(trial))
        res = sdp(C, A, b, config=cfg,
                  prox_method=("eigh", "ns")[trial % 4 == 2])
        x = np.asarray(res.xopt)
    else:
        As = rng.standard_normal((4, 10, 5))
        bs = rng.standard_normal((4, 10))
        res = exchange_quadratic(As, bs, config=cfg)
        x = np.asarray(res.xopt)
    assert 1 <= int(res.steps) <= cfg.maxiters
    assert bool(res.diverged) or np.all(np.isfinite(x))
