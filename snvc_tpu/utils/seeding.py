"""Seeding helpers (reference mis_utils.reset_seed:29-33).

JAX randomness is explicit (PRNG keys), so this only pins the host-side
numpy/python state used by the data pipelines, and hands back a root key.
"""

import random

import numpy as np


def reset_seed(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)
    try:
        import jax

        return jax.random.PRNGKey(seed)
    except Exception:
        return None
