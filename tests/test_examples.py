"""Smoke-run the worked examples at small sizes (reference examples/;
SURVEY.md section 2.6)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.convergencechecking import convergencechecking
from examples.fasteradmmcomparison import fasteradmmcomparison
from examples.hnormdemo import hnormdemo
from examples.mnistsvm import load_mnist, mnistsvm, read_idx_labels
from examples.relaxationexample import relaxationexample
from examples.stepsizetesting import stepsizetesting


def test_convergencechecking_catches_broken_proxes():
    out = convergencechecking(48, 32, quiet=True)
    assert not out["ok-f / ok-g"].diverged
    # At least the both-broken combination must be caught.
    assert out["BROKEN-f / BROKEN-g"].diverged


def test_fasteradmmcomparison_runs():
    out = fasteradmmcomparison(64, 48, quiet=True, maxiters=3000)
    steps_std, xerr_std, _ = out["standard"]
    steps_fast, xerr_fast, _ = out["fast (strong)"]
    assert xerr_std < 1e-2 and xerr_fast < 1e-2
    # Fast ADMM should not be slower in iterations on this strongly
    # convex problem.
    assert steps_fast <= steps_std


def test_stepsize_and_relaxation_studies():
    # Loose errtol: small random squares are marginal at off-default rho
    # (the study's point is the steps-vs-rho curve, not the oracle).
    out = stepsizetesting(rhos=(0.5, 1.0), tester="model", quiet=True,
                          rows=48, cols=48, errtol=1e-2)
    assert all(ok for _, ok in out.values())
    assert all(steps > 0 for steps, _ in out.values())
    out2 = relaxationexample(relaxes=(1.0, 1.5), rows=256, cols=16, quiet=True)
    assert all(xerr < 1e-2 for _, xerr in out2.values())


def test_hnormdemo_runs():
    out = hnormdemo(48, 32, quiet=True)
    for stopcond, (steps, hfinal) in out.items():
        assert steps > 0 and np.isfinite(hfinal)


def test_acceleration_example():
    from examples.acceleration import acceleration_ladder, badly_scaled_lp

    out = acceleration_ladder(rows=100, cols=200, quiet=True)
    objs = [f for _, f in out.values()]
    assert max(objs) - min(objs) <= 1e-6 * (1.0 + abs(objs[0]))
    assert out["anderson m=10"][0] < out["plain"][0]

    lp = badly_scaled_lp(m=24, n=72, quiet=True)
    # Preconditioned runs satisfy BOTH constraint families; AA stacks.
    for name in ("precondition", "precondition + AA"):
        steps, fobj, eq_viol, cone_viol = lp[name]
        assert eq_viol < 1e-6 and cone_viol < 1e-3
    assert lp["precondition + AA"][0] <= lp["precondition"][0]


def test_mnist_synthetic_pipeline():
    rows = mnistsvm(n_train=300, n_test=100, digits=[0, 1], maxiters=100,
                    quiet=True)
    assert len(rows) == 2
    for digit, tr_h, te_h, tr_0, te_0 in rows:
        # One-vs-all on separable-ish synthetic prototypes: must beat the
        # 50% coin flip decisively on train data.
        assert tr_h < 35.0
        assert 0.0 <= te_h <= 100.0


def test_mnist_batched_matches_serial_loop():
    kw = dict(n_train=200, n_test=80, digits=[0, 1, 2], maxiters=80,
              quiet=True)
    batched = mnistsvm(batched=True, **kw)
    serial = mnistsvm(batched=False, **kw)
    for rb, rs in zip(batched, serial):
        np.testing.assert_allclose(rb, rs, atol=1e-9)


def test_mnist_train_all_digits_on_2d_mesh():
    """train_all_digits over the composed lanes-x-shards layout
    (svm_batch_sharded) produces working one-vs-all separators."""
    from examples.mnistsvm import load_mnist, train_all_digits
    from admm_tpu.parallel import make_mesh2d

    (tr_x, tr_y), _, _ = load_mnist(None, 200, 50)
    D = tr_x.reshape(len(tr_x), -1)
    X = train_all_digits(D, tr_y, [0, 1], maxiters=80,
                         mesh=make_mesh2d(2, 4), nshards=4)
    assert X.shape == (2, D.shape[1]) and np.isfinite(X).all()
    for i, d in enumerate([0, 1]):
        ell = np.where(tr_y == d, 1.0, -1.0)
        err = 100.0 * np.mean(np.sign(D @ X[i]) != ell)
        assert err < 35.0, (d, err)


def test_idx_label_parser_against_reference_file():
    """The idx1 parser must read the reference's real MNIST label file
    (examples/MNIST/ — labels ARE present in the mount)."""
    import pathlib

    path = pathlib.Path("/root/reference/examples/MNIST/t10k-labels.idx1-ubyte")
    if not path.exists():
        pytest.skip("reference MNIST labels not mounted")
    labels = read_idx_labels(path)
    assert len(labels) == 10000
    assert set(np.unique(labels)) <= set(range(10))
    # Canonical MNIST t10k openings and class counts — proves these are
    # the REAL bytes, not merely well-formed ones.
    np.testing.assert_array_equal(labels[:10], [7, 2, 1, 0, 4, 1, 4, 9, 5, 9])
    np.testing.assert_array_equal(
        np.bincount(labels),
        [980, 1135, 1032, 1010, 982, 892, 958, 1028, 974, 1009])

    train = path.with_name("train-labels.idx1-ubyte")
    tr = read_idx_labels(train)
    assert len(tr) == 60000
    np.testing.assert_array_equal(tr[:10], [5, 0, 4, 1, 9, 2, 1, 3, 1, 4])


def test_load_mnist_explicit_bad_dir_raises(tmp_path):
    """An EXPLICIT --data path with no label files must raise, not
    silently degrade to synthetic digits (code-review r3)."""
    with pytest.raises(FileNotFoundError, match="idx"):
        load_mnist(data_dir=str(tmp_path / "nope"))


def test_load_mnist_defaults_to_real_labels():
    """With no --data dir, load_mnist must find the reference mount's
    real label files and key synthetic images to them (mnistsvm.m:50-54
    reads real idx files; the images are absent per .MISSING_LARGE_BLOBS)."""
    import pathlib

    if not pathlib.Path(
            "/root/reference/examples/MNIST/train-labels.idx1-ubyte").exists():
        pytest.skip("reference MNIST labels not mounted")
    (tr_x, tr_y), (te_x, te_y), source = load_mnist(n_train=400, n_test=150)
    assert source == "real-labels"
    assert tr_x.shape == (400, 20, 20) and te_x.shape == (150, 20, 20)
    # Labels are a subsample of the real files: all ten digits appear in a
    # 400-draw at overwhelming probability, values confined to 0..9.
    assert set(np.unique(tr_y)) == set(range(10))
    assert set(np.unique(te_y)) <= set(range(10))


def test_idx_loader_round_trip(tmp_path):
    """Write a synthetic idx3/idx1 pair and round-trip the readers
    (reference readMNIST, mnistsvm.m:188-256): big-endian magic/shape
    headers, border trim, /255 scaling, and the magic-number guards."""
    import struct

    import numpy as np

    from examples.mnistsvm import read_idx_images, read_idx_labels

    rng = np.random.default_rng(0)
    count, rows, cols, border = 7, 28, 28, 4
    imgs = rng.integers(0, 256, size=(count, rows, cols), dtype=np.uint8)
    labels = rng.integers(0, 10, size=count, dtype=np.uint8)

    img_path = tmp_path / "imgs.idx3-ubyte"
    with open(img_path, "wb") as f:
        f.write(struct.pack(">IIII", 0x00000803, count, rows, cols))
        f.write(imgs.tobytes())
    lab_path = tmp_path / "labels.idx1-ubyte"
    with open(lab_path, "wb") as f:
        f.write(struct.pack(">II", 0x00000801, count))
        f.write(labels.tobytes())

    out = read_idx_images(img_path, border=border)
    assert out.shape == (count, rows - 2 * border, cols - 2 * border)
    expected = imgs[:, border:rows - border, border:cols - border] / 255.0
    np.testing.assert_allclose(out, expected)
    assert 0.0 <= out.min() and out.max() <= 1.0

    got = read_idx_labels(lab_path)
    np.testing.assert_array_equal(got, labels.astype(np.int64))

    # Magic-number guards: swapping the files must raise, and a
    # little-endian header (the classic byte-order bug) must raise.
    import pytest as _pytest

    with _pytest.raises(ValueError, match="idx3"):
        read_idx_images(lab_path)
    with _pytest.raises(ValueError, match="idx1"):
        read_idx_labels(img_path)
    bad = tmp_path / "bad.idx3-ubyte"
    with open(bad, "wb") as f:
        f.write(struct.pack("<IIII", 0x00000803, count, rows, cols))
        f.write(imgs.tobytes())
    with _pytest.raises(ValueError, match="idx3"):
        read_idx_images(bad)


def test_mpc_qp_warm_start_example():
    from examples.mpc_qp import mpc_qp

    cold, warm = mpc_qp(B=4, n=16, m=6, steps=4, maxiters=2000, quiet=True)
    assert len(cold) == len(warm) == 4
    # After the first step every warm re-solve must beat its cold solve.
    assert all(w < c for w, c in zip(warm[1:], cold[1:]))


def test_hypergradient_tuning_improves_mse():
    from examples.hypergradient import hypergradient_tuning

    hist = hypergradient_tuning(n=80, steps=8, quiet=True)
    lams = [h[0] for h in hist]
    mses = [h[1] for h in hist]
    # The hypergradient must actually move lam and reduce the MSE.
    assert lams[-1] > 2 * lams[0]
    assert mses[-1] < 0.8 * mses[0]


def test_consensus_hypergradient_improves_val_mse():
    """Hyperparameter learning through the SHARDED consensus fixed point
    on the 8-virtual-device mesh (the round-3 differentiable-distributed
    path, exercised end-to-end as a user would run it)."""
    from examples.hypergradient import consensus_hypergradient

    hist = consensus_hypergradient(m=256, n=12, steps=6, quiet=True)
    lams = [h[0] for h in hist]
    mses = [h[1] for h in hist]
    # Started deliberately over-shrunk: lam must fall and val MSE improve.
    assert lams[-1] < 0.5 * lams[0]
    assert mses[-1] < 0.8 * mses[0]


def test_portfolio_frontier():
    """Markowitz frontier via one qp_batch program: weights feasible
    (simplex), frontier monotone in gamma, and one lane cross-checked
    against the serial QP solver."""
    import numpy as np

    from examples.portfolio import efficient_frontier

    rows = efficient_frontier(n_assets=16, n_gammas=6, maxiters=6000,
                              quiet=True)
    gammas = [r[0] for r in rows]
    rets = [r[1] for r in rows]
    vols = [r[2] for r in rows]
    sums = [r[3] for r in rows]
    mins = [r[4] for r in rows]
    assert all(abs(s - 1) < 1e-6 for s in sums)
    assert all(m >= -1e-8 for m in mins)
    # Risk aversion up => volatility down; return non-increasing.
    assert all(v2 <= v1 + 1e-9 for v1, v2 in zip(vols, vols[1:]))
    assert all(r2 <= r1 + 1e-6 for r1, r2 in zip(rets, rets[1:]))

    # Cross-check one lane vs the serial QP wrapper at the same gamma.
    from admm_tpu import ADMMConfig, quadraticprogram

    rng = np.random.default_rng(0)
    F = rng.standard_normal((16, 4)) / 2.0
    Sigma = F @ F.T + np.diag(0.05 + 0.2 * rng.random(16))
    mu = 0.03 + 0.10 * rng.random(16) + 0.05 * np.diag(Sigma)
    g = 2.0
    res = quadraticprogram(Sigma, -mu / g, 0.0, np.ones((1, 16)),
                           np.array([1.0]),
                           ADMMConfig(maxiters=6000, abstol=1e-9,
                                      reltol=1e-9))
    w = np.asarray(res.zopt)
    assert abs(w.sum() - 1) < 1e-6 and w.min() >= -1e-8


def test_maxcut_sdp_relaxation_and_rounding():
    # SDP bound must dominate every rounded cut; GW rounding on a
    # converged relaxation lands far above the 0.878 guarantee on small
    # random graphs.
    from examples.maxcut import maxcut_demo

    rows = maxcut_demo(n_nodes=16, n_graphs=3, quiet=True)
    for _, sdp_val, cut, ratio, steps in rows:
        assert cut <= sdp_val + 1e-6
        assert ratio >= 0.878
        assert steps > 0


def test_distributed_matrix_example():
    """Round-5 example: sharded SDP + consensus covsel on the virtual
    mesh, both matching their serial solves."""
    from examples.distributed_matrix import demo

    out = demo(n=9, m=9, p=10, samples=120, quiet=True)
    assert out["sdp"]["max_dev_vs_serial"] <= 1e-8
    assert out["sdp"]["max_dev_vs_opt"] <= 1e-3
    assert out["covsel"]["obj_gap"] <= 1e-5 * (1 + abs(out["covsel"]["obj_serial"]))
