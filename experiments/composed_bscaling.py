"""B-scaling of the round-4 composed 2-D programs on one chip:
consensus_lasso_batch (B lanes x 8 shards) and svm_batch_sharded
(B classifiers x 8 shards) at growing lane counts — does the composed
throughput keep scaling like the plain vmapped batches do?

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/composed_bscaling.py
"""

import time

import jax
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.parallel import consensus_lasso_batch, svm_batch_sharded
from admm_tpu.parallel.mesh import make_mesh2d

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

rng = np.random.default_rng(0)
m, n, W, ITERS = 4096, 512, 8, 500
D = rng.standard_normal((m, n)).astype(np.float32)
s = rng.standard_normal(m).astype(np.float32)
cfg = ADMMConfig(maxiters=ITERS, domaxiters=True)
mesh = make_mesh2d(1, 1)


def timeit(fn):
    r = fn()
    np.asarray(r.steps)  # host sync after compile
    ts = [fn().runtime for _ in range(3)]
    return min(ts)


print("# consensus_lasso_batch, B lanes x 8 shards, 4096x512")
for B in (1, 8, 32, 128):
    S = np.stack([s + 0.01 * k for k in range(B)]).astype(np.float32)
    t = timeit(lambda: consensus_lasso_batch(D, S, 0.1, cfg, mesh=mesh,
                                             nshards=W))
    print(f"B={B:4d}  {ITERS/t:9.1f} iter/s  {B*ITERS/t:11.0f} inst-iters/s",
          flush=True)

print("# svm_batch_sharded, B classifiers x 8 shards, 4096x512")
y = rng.integers(0, 40, size=m)
for B in (1, 10, 40):
    ells = np.stack([np.where(y == (k % 40), 1.0, -1.0)
                     for k in range(B)]).astype(np.float32)
    t = timeit(lambda: svm_batch_sharded(D, ells, 1.0, cfg, mesh=mesh,
                                         nshards=W))
    print(f"B={B:4d}  {ITERS/t:9.1f} iter/s  {B*ITERS/t:11.0f} inst-iters/s",
          flush=True)
