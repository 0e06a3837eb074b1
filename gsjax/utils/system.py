"""System helpers (utils/system_utils.py equivalents)."""

from __future__ import annotations

import os
import random
import sys
from datetime import datetime


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Deterministic seeding + timestamped stdout
    (utils/general_utils.py:114-135).

    Wraps sys.stdout so every completed line gets a " [dd/mm HH:MM:SS]"
    suffix (or swallows output entirely when `silent`), and seeds the python
    + numpy host RNGs. The torch/cuda seeding of the reference has no
    equivalent: device-side randomness in gsjax flows through explicit
    jax.random keys held in the Trainer, which are already deterministic.
    """
    import numpy as np

    old_f = sys.stdout

    class _F:
        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                old_f.write(x[:-1] + f" [{stamp}]\n")
            else:
                old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = _F()
    random.seed(seed)
    np.random.seed(seed)


def search_max_iteration(folder) -> int:
    """Find max iteration_N subdirectory (utils/system_utils.py:27-29)."""
    iters = [int(d.split("_")[-1]) for d in os.listdir(folder)
             if d.startswith("iteration_")]
    if not iters:
        raise FileNotFoundError(f"no iteration_* under {folder}")
    return max(iters)
