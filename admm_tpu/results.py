"""Results container mirroring the reference's ``results`` struct
(reference: admm.m:746-767 plus per-iteration records admm.m:596-658)."""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import numpy as np


@dataclasses.dataclass
class ADMMResults:
    """Solve results.

    Fields named after the reference's results struct:
      xopt/zopt/uopt (admm.m:747-749), steps (admm.m:746), objopt
      (admm.m:752-753), runtime (admm.m:756), per-iteration traces pnorm/
      dnorm/perr/derr/objevals/Hnormsq/dvals/avals/restarted and optional
      xvals/zvals/uvals (admm.m:596-658).  ``diverged`` surfaces the
      reference's convergence-monitor abort (admm.m:686-703) as a flag
      instead of a printed message.

    Trace arrays are fixed-size (maxiters) with NaN past ``steps``; use
    ``trace()`` to get the valid prefix.
    """

    xopt: Any
    zopt: Any
    uopt: Any
    steps: int
    objopt: Optional[float]
    diverged: bool
    rho_final: float
    hist: dict
    config: Any
    x0: Any = None
    z0: Any = None
    u0: Any = None
    runtime: float = 0.0
    solverruntime: float = 0.0
    extra: dict = dataclasses.field(default_factory=dict)
    # Plateau-stop flag (ADMMConfig.stallwindow): the solve ended because
    # pnorm made no relative progress for stallwindow iterations, not
    # because a convergence test fired.  No reference analog.
    stalled: bool = False

    @classmethod
    def from_raw(cls, raw: dict, config, x0=None, z0=None, u0=None) -> "ADMMResults":
        hist = {k: v for k, v in raw["hist"].items() if not isinstance(v, tuple)}
        objopt = raw.get("objopt")
        if isinstance(objopt, tuple):
            objopt = None
        return cls(
            xopt=raw["xopt"],
            zopt=raw["zopt"],
            uopt=raw["uopt"],
            steps=int(raw["steps"]),
            objopt=None if objopt is None else float(objopt),
            diverged=bool(raw["diverged"]),
            stalled=bool(np.asarray(raw.get("stalled", False))),
            rho_final=float(raw["rho_final"]),
            hist=hist,
            config=config,
            x0=x0,
            z0=z0,
            u0=u0,
        )

    def trace(self, name: str) -> np.ndarray:
        """Valid (length-``steps``) prefix of a per-iteration trace."""
        arr = np.asarray(self.hist[name])
        return arr[: self.steps]

    @property
    def pnorm(self):
        return self.trace("pnorm")

    @property
    def dnorm(self):
        return self.trace("dnorm")

    @property
    def perr(self):
        return self.trace("perr")

    @property
    def derr(self):
        return self.trace("derr")

    @property
    def objevals(self):
        return self.trace("objvals") if "objvals" in self.hist else None

    @property
    def Hnormsq(self):
        return self.trace("Hnormsq") if "Hnormsq" in self.hist else None

    @property
    def dvals(self):
        return self.trace("dvals") if "dvals" in self.hist else None

    @property
    def restarted(self):
        return self.trace("restarted") if "restarted" in self.hist else None

    @property
    def wvals(self):
        """Stacked w = [x; z; rho*u] per iteration (admm.m:680-682);
        recorded under ``record_iterates``."""
        return self.trace("wvals") if "wvals" in self.hist else None
