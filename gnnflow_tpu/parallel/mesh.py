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
HOST_AXIS = "host"


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``num_devices``.

    - 1 axis name → a 1-D mesh (the DP case).
    - 2 axis names with no explicit ``shape`` → a (hosts, chips-per-host)
      mesh: the leading axis spans processes so that collectives over the
      trailing axis ride ICI and only the leading axis crosses DCN.
    - An explicit ``shape`` overrides both (must multiply to the device
      count).
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        elif len(axis_names) == 2:
            hosts = jax.process_count()
            if n % max(hosts, 1):
                hosts = 1
            shape = (hosts, n // hosts)
        else:
            shape = (1,) * (len(axis_names) - 1) + (n,)
    shape = tuple(int(s) for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axis_names))
