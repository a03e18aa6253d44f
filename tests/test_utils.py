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


def test_errorcheck_isstruct_roundtrip():
    # errorcheck.m:117: struct arguments gate through unchanged.
    opts = {"rho": 2.0, "maxiters": 10}
    assert errorcheck(opts, "isstruct") is opts
    with pytest.raises(ValueError, match="must be a struct"):
        errorcheck([("rho", 2.0)], "isstruct", "options")


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


def test_showresults_plots_bound_overlays(tmp_path):
    """The primal/dual panels must carry their perr/derr tolerance curves
    and the accelerated d-value panel its dvaltol line (showresults.m:
    200-408 plots the norms AGAINST the bound curves, not bare)."""
    from admm_tpu import ADMMConfig
    from admm_tpu.models.model import model
    from admm_tpu.utils.report import _plot

    rng = np.random.default_rng(2)
    P, Q = rng.standard_normal((32, 24)), rng.standard_normal((32, 24))
    r, s = rng.standard_normal(32), rng.standard_normal(32)
    res = model(P, Q, r, s, ADMMConfig(objevals=True, maxiters=2000,
                                       fast=True, fasttype="weak"))
    fig = _plot(res, None, show=False, save=None)
    by_title = {ax.get_title(): ax for ax in fig.axes}
    assert "primal norm" in by_title
    prim = by_title["primal norm"]
    labels = [ln.get_label() for ln in prim.get_lines()]
    assert "tolerance bound" in labels, labels
    assert prim.get_legend() is not None
    if "dual norm" in by_title:
        labels_d = [ln.get_label() for ln in by_title["dual norm"].get_lines()]
        assert "tolerance bound" in labels_d
    dv = by_title.get("accelerated d-values")
    assert dv is not None  # fast weak run records d-values
    # dvaltol is drawn as a horizontal threshold line.
    assert any(np.allclose(ln.get_ydata(), res.config.dvaltol)
               for ln in dv.get_lines() if len(np.atleast_1d(ln.get_ydata())))


def test_solvertester_svm_two_curve_plot(tmp_path):
    """The SVM runtime-vs-scale plot must show hinge and 0-1 loss as two
    curves (solvertester.m:243-263)."""
    from admm_tpu.testers.solvertester import solvertester

    path = tmp_path / "svm_sweep.png"
    rep = solvertester("linearsvm", minscale=4, maxscale=4, trials=1,
                       seed=11, save_plot=str(path))
    assert rep.runtimes01 is not None and rep.avetimes01 is not None
    assert np.all(np.isfinite(rep.runtimes01))
    assert path.exists() and path.stat().st_size > 0
    from admm_tpu.testers.solvertester import _plot as _sweep_plot
    fig = _sweep_plot(rep, show=False, save=None)
    labels = [ln.get_label() for ln in fig.axes[0].get_lines()]
    assert "hinge loss" in labels and "0-1 loss" in labels
