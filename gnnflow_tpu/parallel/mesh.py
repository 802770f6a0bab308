"""Device mesh construction.

The TPU-native replacement for the reference's process-group plumbing
(NCCL/Gloo init in ``scripts/offline_edge_prediction.py:155-166``): one
SPMD program over a named :class:`jax.sharding.Mesh`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """Build a 1-D (or reshaped) mesh over the first ``num_devices``."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # split n evenly over leading axes; last axis gets the remainder
        shape = tuple([n // np.prod([1])] )  # pragma: no cover
        raise NotImplementedError("only 1-D meshes are used currently")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
