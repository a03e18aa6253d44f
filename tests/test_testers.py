"""The randomized tester harness itself (reference testers/;
SURVEY.md section 4 tiers 1-2)."""

import numpy as np
import pytest

from admm_tpu.testers import (
    basispursuittest,
    covarianceselectiontest,
    huberfittest,
    ladtest,
    lassotest,
    linearprogramtest,
    linearsvmtest,
    modeltest,
    quadraticprogramtest,
    solvertester,
    totalvariationtest,
)


def test_all_problem_testers_pass_default_instances():
    small = dict(quiet=True)
    checks = [
        modeltest(0, 64, 64, **small),
        lassotest(0, 128, 64, **small),
        basispursuittest(0, 16, 64, **small),
        totalvariationtest(0, 128, **small),
        ladtest(0, 256, 16, **small),
        huberfittest(0, 256, 16, **small),
        linearprogramtest(0, 32, 32, **small),
        quadraticprogramtest(0, 32, 32, **small),
        quadraticprogramtest(0, 32, 32, form="bounded", **small),
        covarianceselectiontest(0, 128, 16, **small),
    ]
    for res, test in checks:
        assert not test["failed"], (test["solver"], test["failreason"])


def test_svm_tester():
    # Default sizes (128/128, sep 0.5): the nonconvex 0-1 loss needs
    # enough samples for a stable separator.
    res_h, res_01, test = linearsvmtest(0, quiet=True)
    assert not test["failed"], test["failreason"]


def test_solvertester_sweep_deterministic():
    rep1 = solvertester("lasso", 4, 5, 2, seed=0, testtype="skinny")
    rep2 = solvertester("lasso", 4, 5, 2, seed=0, testtype="skinny")
    assert not rep1.any_failed
    np.testing.assert_array_equal(rep1.steps, rep2.steps)
    assert rep1.avetimes.shape == (2,)
    assert "lasso" in rep1.summary()


def test_solvertester_unknown_solver():
    with pytest.raises(ValueError, match="unknown solver"):
        solvertester("nope", 4, 4, 1)


def test_svm_imbalance_presets():
    """'morepos'/'moreneg' class-imbalance presets
    (solvertester.m:530-539) must sweep green with unequal class
    sizes."""
    from admm_tpu.testers.solvertester import _shape, solvertester

    mpos, mneg = _shape("linearsvm", 10, "morepos")
    assert mpos < mneg  # reference code: 'morepos' -> more NEG rows
    mpos, mneg = _shape("linearsvm", 10, "moreneg")
    assert mpos > mneg

    rep = solvertester("linearsvm", 4, 4, trials=1, seed=0,
                       testtype="moreneg")
    assert not rep.any_failed


def test_svm_parallel_sweep():
    """options.parallel parity through the sweep harness
    (unwrappedadmmtest.m:41-58 drives solvertester with
    options.parallel='both'): parallel=True routes the SVM oracle
    through the sharded transpose-reduction path and must sweep green
    with the same slope/objective criteria as the serial path."""
    from admm_tpu.testers.solvertester import solvertester

    rep = solvertester("linearsvm", 4, 4, trials=1, seed=0,
                       parallel=True, nshards=4)
    assert not rep.any_failed


def test_custom_scaler_handle():
    """options.scaler parity (solvertester.m:349-356): a user callable
    maps scale -> shape and overrides the presets."""
    from admm_tpu.testers.solvertester import solvertester

    seen = []

    def scaler(s):
        seen.append(s)
        return (3 * 2**s, 2**s)

    rep = solvertester("lasso", 4, 5, trials=1, seed=0, scaler=scaler)
    assert seen == [4, 5]
    assert not rep.any_failed


def test_imbalance_preset_survives_floor():
    """The 256-sample floor must preserve the morepos/moreneg ratio at
    small sweep scales instead of collapsing to balanced 256x256."""
    from admm_tpu.testers.solvertester import _shape

    mpos, mneg = _shape("linearsvm", 4, "morepos")
    assert min(mpos, mneg) >= 256
    assert mneg / mpos == 4.0  # 2^4 / ceil(2^3/2) = 16/4
