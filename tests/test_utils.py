"""Validation DSL + slicemaker (reference errorcheck.m) and the text
report (reference showresults.m)."""

import numpy as np
import pytest

from admm_tpu.utils import errorcheck, slicemaker, showresults


def test_slicemaker_even_split_with_remainder():
    # 10 elements over 4 workers -> [3, 3, 2, 2] (errorcheck.m:240-265).
    assert slicemaker(0, 10, 4) == [3, 3, 2, 2]
    assert slicemaker(0, 8, 4) == [2, 2, 2, 2]
    assert sum(slicemaker(0, 17, 5)) == 17


def test_slicemaker_scalar_blocks():
    assert slicemaker(4, 10, 99) == [4, 4, 2]


def test_slicemaker_explicit_vector():
    assert slicemaker([3, 3, 4], 10, 3) == [3, 3, 4]
    with pytest.raises(ValueError):
        slicemaker([3, 3], 10, 2)


def test_errorcheck_shapes():
    M = np.ones((3, 5))
    assert errorcheck(M, "ismatrix").shape == (3, 5)
    assert errorcheck(M, "isfat").shape == (3, 5)
    with pytest.raises(ValueError):
        errorcheck(M, "isskinny")
    with pytest.raises(ValueError):
        errorcheck(M, "issquare")
    assert errorcheck(np.ones((4, 4)), "issquare").shape == (4, 4)
    assert errorcheck([[1.0, 2.0, 3.0]], "isvector").shape == (3,)
    assert errorcheck(2.0 + 0j, "ispositivereal") == 2.0
    with pytest.raises(ValueError):
        errorcheck(-1, "ispositivereal")
    assert errorcheck(3.0, "isinteger") == 3


def test_showresults_text_report():
    from admm_tpu import ADMMConfig
    from admm_tpu.models.model import model

    rng = np.random.default_rng(0)
    P, Q = rng.standard_normal((32, 24)), rng.standard_normal((32, 24))
    r, s = rng.standard_normal(32), rng.standard_normal(32)
    res = model(P, Q, r, s, ADMMConfig(objevals=True, maxiters=2000, convtest=True))
    out = []
    text = showresults(
        res,
        {"solver": "model", "trueobjopt": 1.23, "failed": False},
        print_fn=out.append,
    )
    assert "ADMM objective" in text
    assert "steps" in text
    assert "PASSED: True" in text
    assert out  # printed


def test_showresults_plots(tmp_path):
    from admm_tpu import ADMMConfig
    from admm_tpu.models.model import model

    rng = np.random.default_rng(1)
    P, Q = rng.standard_normal((32, 24)), rng.standard_normal((32, 24))
    r, s = rng.standard_normal(32), rng.standard_normal(32)
    res = model(P, Q, r, s, ADMMConfig(objevals=True, maxiters=2000, convtest=True))
    path = tmp_path / "conv.png"
    showresults(res, save_plots=str(path), print_fn=lambda *_: None)
    assert path.exists() and path.stat().st_size > 0
