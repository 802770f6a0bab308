"""Checkpointing: params + TGN memory snapshots.

Counterpart of the reference's ``torch.save({'model': state_dict,
'memory': memory.backup()})`` on best validation AP
(``scripts/offline_edge_prediction.py:517-527``), using flax msgpack
serialization.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any,
                    memory_backup: Optional[Dict] = None,
                    extra: Optional[Dict] = None) -> None:
    payload = {
        "params": jax.device_get(params),
        "memory": memory_backup or {},
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(
        jax.tree.map(lambda x: x, payload))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
