"""Solver input validation (the reference's per-solver errorcheck
subfunctions, e.g. lasso.m:132-141, model.m:155-223)."""

import numpy as np
import pytest

from admm_tpu import basispursuit, huberfit, lad, lasso, linearsvm


def test_mismatched_shapes_raise():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((32, 16))
    bad_s = rng.standard_normal(31)
    with pytest.raises(ValueError, match="vector of length 32"):
        lasso(D, bad_s, 0.1)
    with pytest.raises(ValueError, match="vector of length 32"):
        lad(D, bad_s)
    with pytest.raises(ValueError, match="vector of length 32"):
        huberfit(D, bad_s)
    with pytest.raises(ValueError, match="ell"):
        linearsvm(D, bad_s, 1.0)
    with pytest.raises(ValueError, match="must be 2-D"):
        lasso(rng.standard_normal(16), rng.standard_normal(16), 0.1)


def test_verbose_mode_prints(capfd):
    """quiet=False prints the per-iteration table (admm.m:318-330)."""
    import jax

    from admm_tpu import ADMMConfig, model

    rng = np.random.default_rng(1)
    P, Q = rng.standard_normal((24, 16)), rng.standard_normal((24, 16))
    r, s = rng.standard_normal(24), rng.standard_normal(24)
    res = model(P, Q, r, s, ADMMConfig(maxiters=5, domaxiters=True, quiet=False))
    jax.effects_barrier()
    out = capfd.readouterr().out + capfd.readouterr().err
    assert "pnorm" in out
