"""Shared solver-wrapper plumbing.

The reference's solver boilerplate (path setup, option struct fill-in,
per-solver timing, e.g. solvers/model.m:76-142) reduces here to config
merging and a timing decorator.
"""

from __future__ import annotations

import dataclasses
import time
from functools import wraps

from ..config import ADMMConfig


def merge_config(config: ADMMConfig, overrides: dict) -> ADMMConfig:
    """Apply keyword overrides to a config (the reference's pattern of
    solvers mutating the options struct before calling admm)."""
    return dataclasses.replace(config, **overrides) if overrides else config


def bind_data(prox_f, prox_g, obj, data):
    """Close data-convention functions over concrete operands, recovering
    the reference's closure-style prox handles (getproxops returns
    closures over cached factorizations, getProxOps.m:13-31).  For the
    string registry / ad-hoc use only — solvers pass ``data`` through the
    engine so the compiled runner caches across calls."""
    pf = None if prox_f is None else (lambda x, z, u, rho: prox_f(x, z, u, rho, data))
    pg = None if prox_g is None else (lambda x, z, u, rho: prox_g(x, z, u, rho, data))
    ob = None if obj is None else (lambda x, z: obj(x, z, data))
    return pf, pg, ob


def timed_solver(fn):
    """Record whole-solver wall time as ``results.solverruntime``
    (reference: tic/toc around each solver, e.g. solvers/lasso.m:117,243)."""

    @wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        results = fn(*args, **kwargs)
        results.solverruntime = time.perf_counter() - t0
        return results

    return wrapper
