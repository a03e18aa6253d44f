"""Cyclic-reduction tridiagonal solver with precomputed elimination.

The TV x-update solves the FIXED tridiagonal system (I + rho D^T D) x = b
every iteration (getProxOps.m:1044-1048).  A dense inverse costs O(n^2)
per iteration; sequential Thomas elimination is O(n) but serializes (and
XLA's tridiagonal_solve lowers to a scan that is pathologically slow on
TPU).  Cyclic reduction is the TPU-native answer: log2(n) levels of fully
vectorized elementwise work (VPU), O(n log n) total.

Because the matrix is fixed, the elimination coefficients (alpha, beta,
pivots) for every level are computed ONCE at setup on the host; each
per-iteration ``solve(b)`` runs only the b-phase:

  forward, level l (stride s = 2^l):   active i (i mod 2s == 2s-1):
      b_i -= alpha^l_i b_{i-s} + beta^l_i b_{i+s}
  back substitution, level l = L-1..0: active i (i mod 2s == s-1):
      x_i = (b_i - a^l_i x_{i-s} - c^l_i x_{i+s}) / d^l_i

The system is padded to n = 2^L - 1 with identity rows (exact no-ops).
All shifts are jnp.roll + masking — static shapes, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _shift_up(v, s):
    """v_{i-s} with zeros shifted in (values from lower indices)."""
    return jnp.roll(v, s).at[..., :s].set(0.0) if s else v


def _shift_down(v, s):
    """v_{i+s} with zeros shifted in."""
    return jnp.roll(v, -s).at[..., -s:].set(0.0) if s else v


@jax.tree_util.register_pytree_node_class
class CyclicReductionSolver:
    """Solve T x = b for fixed tridiagonal T = tridiag(dl, d, du)."""

    def __init__(self, alphas, betas, a_lv, c_lv, d_lv, masks_f, masks_b, n):
        self.alphas = alphas    # (L, N) forward elimination coefficients
        self.betas = betas      # (L, N)
        self.a_lv = a_lv        # (L, N) sub-diagonal entering each level
        self.c_lv = c_lv        # (L, N) super-diagonal entering each level
        self.d_lv = d_lv        # (L, N) pivots entering each level
        self.masks_f = masks_f  # (L, N) forward-active masks
        self.masks_b = masks_b  # (L, N) backsub-active masks
        self.n = n              # true (unpadded) size

    @classmethod
    def from_tridiag(cls, dl, d, du) -> "CyclicReductionSolver":
        """Precompute elimination state on the host (NumPy, one-time).

        ``dl[i] = T[i, i-1]`` (dl[0] unused), ``du[i] = T[i, i+1]``
        (du[-1] unused).
        """
        dl = np.asarray(dl, np.float64)
        d0 = np.asarray(d, np.float64)
        du = np.asarray(du, np.float64)
        n = d0.shape[0]
        L = max(1, int(np.ceil(np.log2(n + 1))))
        N = 2**L - 1

        a = np.zeros(N)
        c = np.zeros(N)
        dd = np.ones(N)          # identity padding rows
        a[:n] = dl
        a[0] = 0.0
        c[:n] = du
        c[n - 1] = 0.0
        c[n:] = 0.0
        dd[:n] = d0

        alphas, betas = [], []
        a_lv, c_lv, d_lv = [], [], []
        masks_f, masks_b = [], []
        idx = np.arange(N)
        for l in range(L):
            s = 2**l
            mf = (idx % (2 * s)) == (2 * s - 1)      # forward-active
            mb = (idx % (2 * s)) == (s - 1)          # backsub-active
            a_lv.append(a.copy())
            c_lv.append(c.copy())
            d_lv.append(dd.copy())
            masks_b.append(mb)

            am = np.roll(dd, s); am[:s] = 1.0        # d_{i-s}
            ap = np.roll(dd, -s); ap[-s:] = 1.0      # d_{i+s}
            alpha = np.where(mf, a / am, 0.0)
            beta = np.where(mf, c / ap, 0.0)
            alphas.append(alpha)
            betas.append(beta)
            masks_f.append(mf)

            a_up = np.roll(a, s); a_up[:s] = 0.0
            c_up = np.roll(c, s); c_up[:s] = 0.0
            a_dn = np.roll(a, -s); a_dn[-s:] = 0.0
            c_dn = np.roll(c, -s); c_dn[-s:] = 0.0
            dd = np.where(mf, dd - alpha * c_up - beta * a_dn, dd)
            a_new = np.where(mf, -alpha * a_up, a)
            c_new = np.where(mf, -beta * c_dn, c)
            a, c = a_new, c_new

        # Precompute in f64 on the host; store at the platform's widest
        # available float (f64 under x64 on CPU, f32 on TPU).
        pack = lambda arrs: jnp.asarray(np.stack(arrs))
        return cls(
            pack(alphas), pack(betas), pack(a_lv), pack(c_lv), pack(d_lv),
            jnp.asarray(np.stack(masks_f)), jnp.asarray(np.stack(masks_b)), n,
        )

    def solve(self, b):
        dt = b.dtype
        N = self.alphas.shape[1]
        L = self.alphas.shape[0]
        bb = jnp.zeros((N,), dt).at[: self.n].set(b)

        # forward b-reduction
        for l in range(L):
            s = 2**l
            upd = (
                bb
                - self.alphas[l].astype(dt) * _shift_up(bb, s)
                - self.betas[l].astype(dt) * _shift_down(bb, s)
            )
            bb = jnp.where(self.masks_f[l], upd, bb)

        # back substitution
        x = jnp.zeros((N,), dt)
        for l in range(L - 1, -1, -1):
            s = 2**l
            num = (
                bb
                - self.a_lv[l].astype(dt) * _shift_up(x, s)
                - self.c_lv[l].astype(dt) * _shift_down(x, s)
            )
            x = jnp.where(self.masks_b[l], num / self.d_lv[l].astype(dt), x)

        return x[: self.n]

    def tree_flatten(self):
        return (
            (self.alphas, self.betas, self.a_lv, self.c_lv, self.d_lv,
             self.masks_f, self.masks_b),
            self.n,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)
