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
