"""Checkpoint / resume of ADMM solver state.

The reference has no disk checkpointing; its warm-start options x0/z0/u0
(admm.m:252-254, docs admm.m:948-963) are the analog.  Here the ADMM
state tuple (x, z, u, rho, steps) is serialized to a .npz and restored
into the engine's warm-start arguments (SURVEY.md section 5
'Checkpoint / resume').
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from ..results import ADMMResults


def save_state(results: ADMMResults, path: Union[str, Path]) -> None:
    """Persist the resumable state of a solve."""
    path = Path(path)
    np.savez(
        path,
        x=np.asarray(results.xopt),
        z=np.asarray(results.zopt),
        u=np.asarray(results.uopt),
        rho=np.asarray(results.rho_final),
        steps=np.asarray(results.steps),
    )


def load_state(path: Union[str, Path]) -> dict:
    """Load a saved state as warm-start kwargs for ``admm`` (x0/z0/u0)
    plus the rho and step count at save time."""
    with np.load(Path(path)) as f:
        return {
            "x0": f["x"],
            "z0": f["z"],
            "u0": f["u"],
            "rho": float(f["rho"]),
            "steps": int(f["steps"]),
        }
