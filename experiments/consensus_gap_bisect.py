"""Bisect the consensus-runner 3x gap (consensus_shard_probe: lib 58
us/iter vs hand loop 20 at W=8, n=512, 4096 rows).

Variants, interleaved:
  * lib          — consensus_lasso, unroll 4 (the slow case)
  * rawrun       — _make_consensus_run jitted directly, plain arrays
                   (no NamedSharding, no wrapper): is it the trace or
                   the wrapper/sharding?
  * rawrun_nodual— same + nodualerror (drops derr/dual norms)
  * rawrun_u16   — same at unroll 16
  * hand         — the bare loop floor from consensus_shard_probe

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/consensus_gap_bisect.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.parallel import consensus_lasso
from admm_tpu.parallel.consensus import (_lasso_global_prox,
                                         _lasso_local_prox,
                                         _make_consensus_run)
from admm_tpu.engine import _with_matmul_precision

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

rng = np.random.default_rng(0)
m, n, W = 4096, 512, 8
D = rng.standard_normal((m, n)).astype(np.float32)
s = rng.standard_normal(m).astype(np.float32)
LAM = 0.1
ITERS = 2000

Di = jnp.asarray(D.reshape(W, m // W, n))
si = jnp.asarray(s.reshape(W, m // W))
with jax.default_matmul_precision("highest"):
    G = jnp.einsum("wij,wik->wjk", Di, Di) + jnp.eye(n, dtype=Di.dtype)
    Minv = jnp.linalg.inv(G)
    Dtsi = jnp.einsum("wij,wi->wj", Di, si)
data = {"Minv": Minv, "Dtsi": Dtsi, "lam": jnp.asarray(LAM, jnp.float32)}
xi0 = jnp.zeros((W, n), jnp.float32)
ui0 = jnp.zeros((W, n), jnp.float32)
z0 = jnp.zeros((n,), jnp.float32)
jax.block_until_ready((data, xi0, ui0, z0))


def raw_variant(**ckw):
    cfg = ADMMConfig(maxiters=ITERS, domaxiters=True, **ckw)
    run = jax.jit(_with_matmul_precision(
        _make_consensus_run(_lasso_local_prox, _lasso_global_prox, cfg, W, n),
        cfg.matmul_precision))

    def call():
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(data, xi0, ui0, z0))

        class R:
            runtime = time.perf_counter() - t0
            steps = int(out["steps"])
        return R

    return call


def lib_variant(unroll=4):
    cfg = ADMMConfig(maxiters=ITERS, domaxiters=True, unroll=unroll)
    return lambda: consensus_lasso(D, s, LAM, cfg, nshards=W)


import importlib.util as _iu
_spec = _iu.spec_from_file_location(
    "csp", __file__.replace("consensus_gap_bisect", "consensus_shard_probe"))
_csp = _iu.module_from_spec(_spec)
_spec.loader.exec_module(_csp)

variants = {
    "lib_u4": lib_variant(4),
    "rawrun_u4": raw_variant(unroll=4),
    "rawrun_u4_nodual": raw_variant(unroll=4, nodualerror=True),
    "rawrun_u16": raw_variant(unroll=16),
    "hand_K16": _csp.hand_loop(W=W, K=16),
}

for name, fn in variants.items():
    t0 = time.perf_counter()
    r = fn()
    print(f"# warm {name}: steps {r.steps} "
          f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)

results = {k: [] for k in variants}
for _ in range(4):
    for name, fn in variants.items():
        results[name].append(fn().runtime)

print(f"\n# W={W}, {m}x{n}, {ITERS} iters; interleaved")
for name, ts in results.items():
    best, med = min(ts), sorted(ts)[len(ts) // 2]
    print(f"{name:18s} best {ITERS / best:9.0f} iter/s "
          f"{best / ITERS * 1e6:7.2f} us/iter   median "
          f"{med / ITERS * 1e6:7.2f} us/iter", flush=True)
