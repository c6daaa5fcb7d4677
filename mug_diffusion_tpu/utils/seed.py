"""Deterministic seeding across Python/NumPy/JAX (ref: Lightning
seed_everything at main.py:525 and webui.py:301-307)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int) -> int:
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
