"""Single-chip consensus overhead breakdown (VERDICT r3 weak #5 / next #2).

consensus_lasso at 8 shards reads ~8.8k iter/s on one v5e chip while the
serial lasso shapes sit at 24.7-47k — expected (the stacked per-shard
Minv streams are W x the serial bytes), but unattributed.  This probe
interleaves, in ONE process (the tunnel's +-10-20% drift makes separate
runs incomparable):

  * consensus_lasso W in {1, 2, 4, 8} at the default unroll (4) —
    the shard-count series at fixed total rows (4096 x 512, the
    BENCH_MATRIX consensus shape);
  * W = 8 at unroll in {1, 16, 64} — is the consensus body, like the
    serial GEMV bodies, dispatch-bound and VMEM-residentable?  (The
    stacked Minv at W=8, n=512 is 8 MB — comfortably VMEM-resident.)
  * a bare hand-written consensus loop at W = 8, K = 16 (batched-GEMV
    x-solve, means, soft-threshold, dual update, Boyd norms + history
    writes, done-masking — the full-featured floor in the style of
    lp_tail_probe3.py): the gap between this and the engine is engine
    overhead; the gap between this and the HBM roofline (~10 us/iter
    at 8 MB/iter) is the kernel-issue / turnaround floor.

Run on the TPU:  python experiments/consensus_shard_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from admm_tpu import ADMMConfig
from admm_tpu.parallel import consensus_lasso

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

rng = np.random.default_rng(0)
m, n = 4096, 512
D = rng.standard_normal((m, n)).astype(np.float32)
s = rng.standard_normal(m).astype(np.float32)
LAM = 0.1
ITERS = 2000


def lib_variant(W, unroll):
    cfg = ADMMConfig(maxiters=ITERS, domaxiters=True, unroll=unroll)
    return lambda: consensus_lasso(D, s, LAM, cfg, nshards=W)


def hand_loop(W=8, K=16):
    """Full-featured bare consensus loop (floor for engine overhead)."""
    from admm_tpu.parallel.mesh import pad_rows, shard_rows

    Dp, _ = pad_rows(D, W)
    sp, _ = pad_rows(s, W)
    Di = jnp.asarray(shard_rows(Dp, W))
    si = jnp.asarray(shard_rows(sp, W))
    with jax.default_matmul_precision("highest"):
        G = jnp.einsum("wij,wik->wjk", Di, Di) + jnp.eye(n, dtype=Di.dtype)
        Minv = jnp.linalg.inv(G)
        Dtsi = jnp.einsum("wij,wi->wj", Di, si)
    jax.block_until_ready((Minv, Dtsi))

    @jax.jit
    def run(Minv, Dtsi):
        with jax.default_matmul_precision("highest"):
            hist = {k: jnp.full((ITERS,), jnp.nan, jnp.float32)
                    for k in ("pnorm", "dnorm", "perr", "derr")}
            carry0 = {"k": jnp.int32(0), "xi": jnp.zeros((W, n), jnp.float32),
                      "z": jnp.zeros(n, jnp.float32),
                      "ui": jnp.zeros((W, n), jnp.float32),
                      "xbp": jnp.zeros(n, jnp.float32),
                      "done": jnp.asarray(False), "hist": hist}

            def sub(c):
                k, z, ui, done = c["k"], c["z"], c["ui"], c["done"]
                rhs = Dtsi + 1.0 * (z[None, :] - ui)
                xi = jnp.einsum("wij,wj->wi", Minv, rhs)
                xbar = jnp.mean(xi, axis=0)
                ubar = jnp.mean(ui, axis=0)
                v = xbar + ubar
                t = LAM / (1.0 * W)
                znew = jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)
                uin = ui + (xi - znew[None, :])
                pn = jnp.sum((xi - xbar[None, :]) ** 2)
                dn = W * jnp.sum((xbar - c["xbp"]) ** 2)
                sqn = jnp.sqrt(jnp.float32(n))
                pe = sqn * 1e-5 + 1e-3 * jnp.maximum(
                    jnp.linalg.norm(xbar), jnp.linalg.norm(znew))
                de = sqn * 1e-5 + 1e-3 * jnp.linalg.norm(ubar)
                live = jnp.logical_not(done)
                h = dict(c["hist"])
                kw = jnp.where(live, k, ITERS)
                for name, val in (("pnorm", pn), ("dnorm", dn),
                                  ("perr", pe), ("derr", de)):
                    h[name] = h[name].at[kw].set(val, mode="drop")
                sel = lambda old, new: jnp.where(live, new, old)
                return {"k": sel(k, k + 1), "xi": sel(c["xi"], xi),
                        "z": sel(z, znew), "ui": sel(ui, uin),
                        "xbp": sel(c["xbp"], xbar),
                        "done": done, "hist": h}

            def body(c):
                for _ in range(K):
                    c = sub(c)
                return c

            cond = lambda c: jnp.logical_and(c["k"] < ITERS,
                                             jnp.logical_not(c["done"]))
            return jax.lax.while_loop(cond, body, carry0)

    def call():
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(Minv, Dtsi))
        class R:  # noqa: duck-typed .runtime/.steps like ADMMResults
            runtime = time.perf_counter() - t0
            steps = int(out["k"])
        return R

    return call


def main():
    variants = {}
    for W in (1, 2, 4, 8):
        variants[f"W{W}_u4"] = lib_variant(W, 4)
    for u in (1, 16, 64):
        variants[f"W8_u{u}"] = lib_variant(8, u)
    variants["W8_hand_K16"] = hand_loop()

    # Compile warm-up, host-materialized (CLAUDE.md relay gotcha).
    for name, fn in variants.items():
        t0 = time.perf_counter()
        r = fn()
        print(f"# warm {name}: steps {r.steps} "
              f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)

    results = {k: [] for k in variants}
    for _ in range(4):
        for name, fn in variants.items():
            results[name].append(fn().runtime)

    print(f"\n# shape {m}x{n}, {ITERS} iters, f32; interleaved best/median")
    for name, ts in results.items():
        best, med = min(ts), sorted(ts)[len(ts) // 2]
        print(f"{name:14s} best {ITERS / best:9.0f} iter/s "
              f"{best / ITERS * 1e6:7.2f} us/iter   "
              f"median {med / ITERS * 1e6:7.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()
