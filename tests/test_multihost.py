"""Multi-controller (jax.distributed) smoke tests: two OS processes, each
contributing virtual CPU devices to one global mesh.  Validates that the
distributed layer's collectives and the consensus solver run across
process boundaries — the single-host stand-in for a multi-host pod
(parallel/multihost.py)."""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parent.parent)


def _run_workers(worker_code: str, procs: int = 2, timeout: int = 300) -> int:
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    children = [
        subprocess.Popen([sys.executable, "-c", worker_code, str(i)], env=env)
        for i in range(procs)
    ]
    rc = 0
    for c in children:
        try:
            rc |= c.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            c.kill()
            rc |= 1
    return rc


def test_consensus_lasso_across_two_processes():
    """consensus_lasso must run UNMODIFIED over a mesh spanning two
    jax.distributed processes (global device_put + cross-process
    all-reduce consensus aggregation)."""
    code = textwrap.dedent('''
        import os, sys
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=2")
        import jax
        jax.config.update("jax_platforms", "cpu")
        pid = int(sys.argv[1])
        jax.distributed.initialize("127.0.0.1:47217", 2, pid)
        assert len(jax.devices()) == 4
        import numpy as np
        from admm_tpu import ADMMConfig
        from admm_tpu.parallel import consensus_lasso, make_mesh
        rng = np.random.default_rng(0)
        D = rng.standard_normal((64, 8))
        s = rng.standard_normal(64)
        res = consensus_lasso(D, s, 0.1, ADMMConfig(maxiters=200),
                              mesh=make_mesh())
        z = np.asarray(jax.device_get(res.zopt))
        assert np.isfinite(z).all()
        assert res.steps > 0
    ''')
    rc = _run_workers(code)
    if rc != 0:
        pytest.skip("jax.distributed unavailable in this environment")


def test_sharded_svm_across_two_processes():
    """The transpose-reduction SVM (psum of per-shard D_i^T v_i +
    replicated solve) must also run over a cross-process mesh."""
    code = textwrap.dedent('''
        import os, sys
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=2")
        import jax
        jax.config.update("jax_platforms", "cpu")
        pid = int(sys.argv[1])
        jax.distributed.initialize("127.0.0.1:47219", 2, pid)
        import numpy as np
        from admm_tpu import ADMMConfig
        from admm_tpu.parallel import linearsvm_sharded, make_mesh
        from admm_tpu.testers.problems import make_svm_instance
        D, ell = make_svm_instance(0, 64, 64, 0.5)
        res = linearsvm_sharded(D, ell, 1.0, ADMMConfig(maxiters=300),
                                mesh=make_mesh())
        x = np.asarray(jax.device_get(res.xopt))
        assert np.isfinite(x).all()
        assert x[0] > 0 and x[1] < 0  # separator orientation recovered
    ''')
    rc = _run_workers(code)
    if rc != 0:
        pytest.skip("jax.distributed unavailable in this environment")
