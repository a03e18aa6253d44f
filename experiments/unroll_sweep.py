"""Headline unroll sweep at K in {16, 32, 64}, f32 + bf16 streams.

Decides the headline bench's unroll setting against the measured XLA
floors (pure 2-GEMV chain: 36.4 us/iter at K=16, 29.8 at K=64; full
body + norms at K=16: 38.5 us/iter — experiments/gemv_floor2.py).
"""

import time

import jax.numpy as jnp
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.models.lasso import lasso

m, n = 1500, 5000
rng = np.random.default_rng(0)
testx = rng.standard_normal(n) * (rng.random(n) < 0.1)
D = rng.standard_normal((m, n)).astype(np.float32)
D = D / np.sqrt(np.sum(D**2, axis=0, keepdims=True))
s = (D @ testx + np.sqrt(0.001) * rng.standard_normal(m)).astype(np.float32)
lam = float(0.1 * np.max(np.abs(D.T @ s)))

iters = 4096
for K in (16, 32, 64):
    cfg = ADMMConfig(maxiters=iters, domaxiters=True, unroll=K)
    for dt, name in ((None, "f32"), (jnp.bfloat16, "bf16")):
        kw = {} if dt is None else {"stream_dtype": dt}
        t0 = time.perf_counter()
        lasso(D, s, lam, cfg, **kw)  # compile
        tc = time.perf_counter() - t0
        best = min(
            lasso(D, s, lam, cfg, **kw).runtime for _ in range(3)
        )
        print(
            f"K={K:3d} {name:5s} {iters / best:9.0f} iter/s "
            f"{best / iters * 1e6:7.2f} us/iter  (compile {tc:.0f}s)",
            flush=True,
        )
