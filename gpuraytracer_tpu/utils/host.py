"""Host<->device transfer helpers.

The render graph's outputs can carry compiler-chosen tiled layouts; some
transports (notably tunneled single-chip dev setups) degrade badly when
fetching such buffers. ``fetch`` forces a canonical row-major copy on device
first, making device->host readback cost proportional to payload size — the
analog of the reference's explicit ``getBytes`` readback
(RTrace/image.swift:35-38).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _ravel(x):
    return jnp.ravel(x)


def fetch(x) -> np.ndarray:
    """Device array -> numpy, via an on-device re-layout to 1-D."""
    x = jnp.asarray(x)
    return np.asarray(_ravel(x)).reshape(x.shape)


def fetch_tree(tree):
    return jax.tree.map(fetch, tree)
