"""Deterministic bring-up + timestamped stdout (the reference's safe_state,
/root/reference/gs3dgs/utils/general_utils.py:127-148): wraps stdout so each
line is suffixed with a timestamp, seeds python/numpy RNGs (seed 0), and
returns a seeded jax PRNG key (the TPU-native analog of the reference's
torch/cuda seeding)."""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


class _TimestampedStdout:
    def __init__(self, old, silent: bool):
        self.old = old
        self.silent = silent

    def write(self, x: str):
        if self.silent:
            return
        if x.endswith("\n"):
            stamp = datetime.now().strftime("%d/%m %H:%M:%S")
            self.old.write(x.replace("\n", f" [{stamp}]\n"))
        else:
            self.old.write(x)

    def flush(self):
        self.old.flush()


def safe_state(silent: bool = False, seed: int = 0):
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
