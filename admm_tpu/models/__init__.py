"""Problem library: solver wrappers + proximal-operator registry.

TPU-native analog of the reference's solvers/ directory and the
getProxOps.m string switch (getProxOps.m:52-917).  Each module exposes
``make_prox_ops(...)`` (the registry entry) and a solver entry point with
the reference solver's signature.
"""

from .model import model

__all__ = ["model", "get_prox_ops"]

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name.lower()] = fn
        return fn

    return deco


def get_prox_ops(problem: str, **args):
    """String-keyed prox-op factory mirroring getproxops(problem, args)
    (reference getProxOps.m:13-31).  Prefer the typed per-module
    ``make_prox_ops`` in new code."""
    from . import (  # noqa: F401  (import registers entries)
        basispursuit,
        covarianceselection,
        huberfit,
        lad,
        lasso,
        linearprogram,
        linearsvm,
        model as _model,
        quadraticprogram,
        totalvariation,
    )

    key = problem.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown problem {problem!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key](**args)
