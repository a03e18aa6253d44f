"""Zero-arg demo mode: every solver called with no arguments runs its
demo tester (reference solvers, e.g. lasso.m:122-129)."""

from admm_tpu import lasso, model


def test_solver_demo_mode(capsys):
    res = model()
    assert res.steps > 0
    out = capsys.readouterr().out
    assert "ADMM results" in out

    res2 = lasso()
    assert res2.steps > 0
