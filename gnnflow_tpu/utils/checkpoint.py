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


def migrate_params(params: Dict) -> Dict:
    """Upgrade pre-round-2 checkpoints in place: split ``w_k``/``w_v``
    Linear pairs are fused into the current ``w_kv`` MultiLinear layout
    (``kv = x @ [K_k | K_v]``, so the fused kernel/bias are the
    column-wise concatenation — numerically identical).  Current
    checkpoints pass through untouched."""
    import numpy as np

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "w_k" in node and "w_v" in node and "w_kv" not in node:
            wk, wv = node.pop("w_k"), node.pop("w_v")
            node["w_kv"] = {
                "kernel": np.concatenate(
                    [wk["kernel"], wv["kernel"]], axis=-1),
                "bias": np.concatenate([wk["bias"], wv["bias"]], axis=-1),
            }
        for k, v in node.items():
            node[k] = walk(v)
        return node

    return walk(params)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if isinstance(payload, dict) and "params" in payload:
        payload["params"] = migrate_params(payload["params"])
    return payload
