"""Randomized correctness/scaling test harness.

TPU-native analog of the reference's testers/ directory (SURVEY.md
sections 2.5, 4): per-problem randomized oracle testers with the
reference signature ``<name>test(seed, rows, cols, errtol, quiet,
options)`` returning (results, test) with pass/fail + reason, plus the
multi-scale batch harness ``solvertester`` (testers/solvertester.m:29).
"""

from .problems import (
    basispursuittest,
    covarianceselectiontest,
    huberfittest,
    ladtest,
    lassotest,
    linearprogramtest,
    logregtest,
    linearsvmtest,
    modeltest,
    quadraticprogramtest,
    totalvariationtest,
)
from .solvertester import solvertester

__all__ = [
    "solvertester",
    "modeltest",
    "lassotest",
    "basispursuittest",
    "totalvariationtest",
    "ladtest",
    "huberfittest",
    "linearprogramtest",
    "logregtest",
    "quadraticprogramtest",
    "covarianceselectiontest",
    "linearsvmtest",
]
