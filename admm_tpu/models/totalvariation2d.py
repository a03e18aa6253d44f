"""2-D (image) total variation denoising — TPU-native EXTENSION.

No reference analog (the reference's TV is 1-D, solvers/totalvariation.m);
this extends the same splitting to images with anisotropic TV:

    min 1/2 ||X - S||_F^2 + lambda ||Z||_1   s.t.   A X - Z = 0,
    A X = stack(D_r X, X D_c^T)        (row and column differences,
                                        same stencil as linop.DiffOp)

x-update:  (I + rho (D_r^T D_r (+) D_c^T D_c)) X = S + rho A^T (Z - U)
           — a Sylvester-structured system diagonalized by the two SMALL
           1-D eigenbases:  X = U_r [ (U_r^T B U_c) / (1 + rho (wr_i +
           wc_j)) ] U_c^T.  Per-iteration work is four dense matmuls
           (MXU) of shapes (m,m)x(m,n) and (m,n)x(n,n) — no n^2-by-n^2
           system is ever formed.
z-update:  soft_threshold(A X + U, lambda / rho)   (elementwise, VPU)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ADMMConfig
from ..engine import Hooks, admm
from ..linop import DiffOp
from ..ops.prox import soft_threshold
from ..results import ADMMResults
from ._common import merge_config, timed_solver


@jax.tree_util.register_pytree_node_class
class TV2DOp:
    """A X = stack(D_r X, X D_c^T) with the DiffOp stencil on each axis."""

    def __init__(self, m: int, n: int):
        self.m = m
        self.n = n

    @staticmethod
    def _d(v, axis):
        # (D v)_i = v_i - v_{i+1}, last element kept (DiffOp semantics).
        shifted = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=axis))],
            axis=axis,
        )
        return v - shifted

    @staticmethod
    def _dt(v, axis):
        shifted = jnp.concatenate(
            [jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=axis)),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        return v - shifted

    def mv(self, X):
        return jnp.stack([self._d(X, 0), self._d(X, 1)])

    def rmv(self, V):
        return self._dt(V[0], 0) + self._dt(V[1], 1)

    def out_shape(self, in_shape):
        return (2,) + tuple(in_shape)

    def tree_flatten(self):
        return (), (self.m, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)


def _prox_f(X, Z, U, rho, d):
    B = d["S"] + rho * d["A"].rmv(Z - U)
    Y = d["Ur"].T @ B @ d["Uc"]
    Y = Y / (1.0 + rho * (d["wr"][:, None] + d["wc"][None, :]))
    return d["Ur"] @ Y @ d["Uc"].T


def _prox_g(X, Z, U, rho, d):
    return soft_threshold(U + d["A"].mv(X), d["lam"] / rho)


def _obj(X, Z, d):
    return 0.5 * jnp.sum((X - d["S"]) ** 2) + d["lam"] * jnp.sum(jnp.abs(Z))


def make_prox_ops(S, lam, config: ADMMConfig = ADMMConfig()):
    S = jnp.asarray(S)
    m, n = S.shape
    A = TV2DOp(m, n)
    Lr = DiffOp(m).dense(S.dtype)
    Lc = DiffOp(n).dense(S.dtype)
    wr, Ur = jnp.linalg.eigh(Lr.T @ Lr)
    wc, Uc = jnp.linalg.eigh(Lc.T @ Lc)
    data = {"S": S, "lam": jnp.asarray(lam, S.dtype), "A": A,
            "Ur": Ur, "wr": wr, "Uc": Uc, "wc": wc}
    return _prox_f, _prox_g, _obj, data, A


@timed_solver
def totalvariation2d(S, lam, config: ADMMConfig = ADMMConfig(), **overrides) -> ADMMResults:
    """Denoise an image by anisotropic 2-D TV."""
    config = merge_config(config, overrides)
    S = jnp.asarray(S)
    m, n = S.shape
    prox_f, prox_g, obj, data, A = make_prox_ops(S, lam, config)
    zeros_x = jnp.zeros((m, n), S.dtype)
    zeros_z = jnp.zeros((2, m, n), S.dtype)
    return admm(
        prox_f, prox_g, config,
        A=A, B=-1.0, c=0.0,
        shape_x=(m, n), shape_z=(2, m, n),
        x0=zeros_x, z0=zeros_z, u0=zeros_z,
        hooks=Hooks(obj=obj), dtype=S.dtype, data=data,
    )
