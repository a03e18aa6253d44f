"""Checkpoint / resume (utils/checkpoint.py): saving the state tuple and
warm-starting from it must continue the solve, not restart it."""

import numpy as np

from admm_tpu import ADMMConfig, Hooks, admm
from admm_tpu.models.model import make_prox_ops
from admm_tpu.utils import load_state, save_state


def test_save_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    m, n = 64, 48
    P, Q = rng.standard_normal((m, n)), rng.standard_normal((m, n))
    r, s = rng.standard_normal(m), rng.standard_normal(m)
    truex = np.linalg.solve(P.T @ P + Q.T @ Q, P.T @ r + Q.T @ s)

    cfg = ADMMConfig(maxiters=10000)
    pf, pg, obj, data = make_prox_ops(P, Q, r, s, cfg)

    # Run only 30 iterations, checkpoint, then resume to convergence.
    partial_ = admm(pf, pg, ADMMConfig(maxiters=30, domaxiters=True),
                    A=1.0, B=-1.0, c=0.0, m=n, data=data)
    ckpt = tmp_path / "state.npz"
    save_state(partial_, ckpt)
    state = load_state(ckpt)
    assert state["steps"] == 30

    resumed = admm(pf, pg, cfg, A=1.0, B=-1.0, c=0.0, m=n,
                   x0=state["x0"], z0=state["z0"], u0=state["u0"], data=data)
    cold = admm(pf, pg, cfg, A=1.0, B=-1.0, c=0.0, m=n, data=data)

    # Resume must converge in fewer iterations than a cold start and reach
    # the same solution.
    assert resumed.steps < cold.steps
    np.testing.assert_allclose(np.asarray(resumed.xopt), truex, atol=1e-2)


def test_orbax_roundtrip_with_sharded_consensus_state(tmp_path):
    """The orbax backend must round-trip consensus state including the
    per-shard xi/ui arrays (sharded over the mesh)."""
    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso
    from admm_tpu.utils import load_state_orbax, save_state_orbax

    rng = np.random.default_rng(1)
    D = rng.standard_normal((128, 16))
    s = rng.standard_normal(128)
    res = consensus_lasso(D, s, 0.1, ADMMConfig(maxiters=200))

    path = tmp_path / "consensus_ckpt"
    save_state_orbax(res, path)
    state = load_state_orbax(path)
    np.testing.assert_allclose(np.asarray(state["x0"]), np.asarray(res.xopt))
    np.testing.assert_allclose(np.asarray(state["xi"]), np.asarray(res.extra["xi"]))
    np.testing.assert_allclose(np.asarray(state["ui"]), np.asarray(res.extra["ui"]))
    assert state["steps"] == res.steps


def test_orbax_checkpoint_resumes_consensus_solve(tmp_path):
    """End-to-end resume: save a partial consensus solve with orbax,
    restore, and continue via the consensus warm-start arguments
    (xi0/ui0/z0) — the checkpoint is now actually RESUMABLE, not just
    round-trippable."""
    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso
    from admm_tpu.utils import load_state_orbax, save_state_orbax

    rng = np.random.default_rng(2)
    D = rng.standard_normal((256, 24))
    s = rng.standard_normal(256)
    lam = 0.1
    obj = lambda x: 0.5 * np.sum((D @ x - s) ** 2) + lam * np.sum(np.abs(x))

    cold = consensus_lasso(D, s, lam, ADMMConfig(maxiters=5000))
    pre = consensus_lasso(D, s, lam, ADMMConfig(maxiters=15, domaxiters=True))
    path = tmp_path / "partial"
    save_state_orbax(pre, path)
    state = load_state_orbax(path)

    resumed = consensus_lasso(
        D, s, lam, ADMMConfig(maxiters=5000),
        xi0=state["xi"], ui0=state["ui"], z0=state["z0"])
    assert resumed.steps < cold.steps
    f_cold, f_res = obj(np.asarray(cold.zopt)), obj(np.asarray(resumed.zopt))
    assert abs(f_res - f_cold) <= 1e-3 * abs(f_cold)


def test_orbax_roundtrip_2d_batch_state(tmp_path):
    """Checkpoint/resume of the 2-D (lanes x shards) batched consensus
    state: the orbax round trip must preserve the per-lane sharded
    xi/ui, and resuming from them converges in a few polish steps."""
    import numpy as np

    from admm_tpu import ADMMConfig
    from admm_tpu.parallel import consensus_lasso_batch, make_mesh2d
    from admm_tpu.utils.checkpoint import load_state_orbax, save_state_orbax

    rng = np.random.default_rng(20)
    D = rng.standard_normal((48, 8))
    S = rng.standard_normal((4, 48))
    mesh = make_mesh2d(2, 2)
    cfg = ADMMConfig(maxiters=400)
    full = consensus_lasso_batch(D, S, 0.2, cfg, mesh=mesh)

    save_state_orbax(full, tmp_path / "ckpt2d")
    state = load_state_orbax(tmp_path / "ckpt2d")
    np.testing.assert_array_equal(np.asarray(state["steps"]),
                                  np.asarray(full.steps))
    np.testing.assert_allclose(np.asarray(state["xi"]),
                               np.asarray(full.extra["xi"]), rtol=1e-12)

    resumed = consensus_lasso_batch(
        D, S, 0.2, cfg, mesh=mesh,
        xi0=np.asarray(state["xi"]), ui0=np.asarray(state["ui"]),
        z0=np.asarray(state["z0"]))
    assert int(np.asarray(resumed.steps).max()) <= 3
