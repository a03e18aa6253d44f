"""The string-keyed prox-op registry mirrors getproxops(problem, args)
(reference getProxOps.m:13-31)."""

import numpy as np
import pytest

from admm_tpu import get_prox_ops


def test_registry_all_problems_resolve():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((32, 16))
    Dfat = rng.standard_normal((16, 32))
    s32 = rng.standard_normal(32)
    s16 = rng.standard_normal(16)
    n16 = rng.standard_normal(16)
    cases = {
        "model": dict(P=D, Q=D, r=s32, s=s32),
        "lasso": dict(D=D, s=s32, lam=0.1),
        "basispursuit": dict(D=Dfat, s=s16),
        "totalvariation": dict(s=s32, lam=1.0),
        "lad": dict(D=D, s=s32),
        "huberfit": dict(D=D, s=s32),
        "linearprogram": dict(b=n16, D=D, s=s32),
        "quadraticprogram": dict(P=np.eye(16), q=n16, lb=-np.ones(16), ub=np.ones(16)),
        "covarianceselection": dict(S=np.eye(16), lam=1.0),
        "linearsvm": dict(D=D, ell=np.sign(s32), C=0.5),
    }
    for name, args in cases.items():
        out = get_prox_ops(name, **args)
        assert len(out) >= 2, name
        # prox_f may be None only for the SVM (x-update owned by the
        # unwrapped driver, linearsvm.m:242).
        if name != "linearsvm":
            assert callable(out[0]), name
        assert callable(out[1]), name


def test_registry_unknown_problem():
    with pytest.raises(ValueError, match="unknown problem"):
        get_prox_ops("nosuchproblem")


def test_registry_accepts_args_struct():
    """get_prox_ops(problem, args) with a struct (dict) second argument —
    the reference's calling convention (getProxOps.m:13) — validated by
    errorcheck('isstruct')."""
    import numpy as np
    import pytest

    from admm_tpu.models import get_prox_ops

    rng = np.random.default_rng(0)
    D = rng.standard_normal((32, 16))
    s = rng.standard_normal(32)
    pf, pg, obj = get_prox_ops("lasso", {"D": D, "s": s, "lam": 0.3})
    x = pf(np.zeros(16), np.zeros(16), np.zeros(16), 1.0)
    assert np.isfinite(np.asarray(x)).all()
    with pytest.raises(ValueError, match="struct"):
        get_prox_ops("lasso", [("D", D)])
