"""Determinism utilities.

The reference seeds global RNGs and flips cudnn-deterministic at import
(``utilities.py:505-519,1011``; ``dvgl_benchmark/commons.py:14-27``
``make_deterministic``). JAX is deterministic by construction — randomness is
explicit key threading — so the only global state worth seeding is
numpy/python for host-side shuffles, plus a helper that derives fresh JAX
keys from one root seed.
"""

from __future__ import annotations

import os
import random
from typing import Iterator

import numpy as np


def seed_everything(seed: int = 42) -> None:
    """Seed python/numpy global RNGs (host-side shuffles, synthetic data).
    Device-side randomness uses explicit jax.random keys — see key_stream."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def make_deterministic(seed: int = 42) -> None:
    """dvgl commons.py API name; identical behavior on TPU."""
    seed_everything(seed)


def key_stream(seed: int = 42) -> Iterator:
    """Infinite stream of fresh jax.random keys from one root seed."""
    import jax

    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub
