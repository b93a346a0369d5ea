"""Device->host transfer helpers.

The remote-TPU tunnel in this environment transfers uint8 arrays
pathologically slowly (~40s for a 170KB image vs 16ms as int32).  Every
image download must go through fetch_image, which widens u8 to int32 on
device, transfers, and narrows back on host — bit-identical bytes, ~2500x
faster.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fetch(x) -> np.ndarray:
    """Device array -> numpy, avoiding the slow u8 transfer path."""
    if hasattr(x, "dtype") and x.dtype == jnp.uint8:
        return np.asarray(jnp.asarray(x, jnp.int32)).astype(np.uint8)
    return np.asarray(x)


def fetch_image(x) -> np.ndarray:
    """Alias for readability at image edges."""
    return fetch(x)
