"""Partitioned-split and sharded-node-feature loaders
(``gnnflow/utils.py:154-246`` counterparts)."""
import os

import numpy as np
import pandas as pd
import pytest

from gnnflow_tpu.data import (load_partitioned_dataset,
                              load_sharded_node_feat,
                              make_synthetic_dataset)
from gnnflow_tpu.parallel import make_mesh


def test_load_partitioned_dataset(tmp_path):
    d = tmp_path / "FAKE"
    d.mkdir()
    for rank in range(2):
        for split, n in (("train", 10), ("val", 4), ("test", 4)):
            pd.DataFrame({
                "src": np.arange(n) + rank * 100,
                "dst": np.arange(n) + 1,
                "time": np.arange(n, dtype=np.float32),
                "ext_roll": np.zeros(n, np.int64),
            }).to_csv(d / f"edges_{split}_2_{rank}.csv", index=True)
    train, val, test = load_partitioned_dataset(
        "FAKE", data_dir=str(tmp_path), rank=1, world_size=2)
    assert len(train) == 10 and len(val) == 4 and len(test) == 4
    assert train.src[0] == 100
    train, val, test = load_partitioned_dataset(
        "FAKE", data_dir=str(tmp_path), rank=0, world_size=2,
        partition_train_data=True)
    assert train is None and len(val) == 4
    with pytest.raises(ValueError):
        load_partitioned_dataset("FAKE", data_dir=str(tmp_path),
                                 rank=5, world_size=2)


def test_load_sharded_node_feat(tmp_path):
    d = tmp_path / "MAGLIKE"
    d.mkdir()
    rng = np.random.RandomState(0)
    # three UNEVEN parts
    parts = [rng.randn(n, 5).astype(np.float32) for n in (13, 7, 22)]
    for i, p in enumerate(parts):
        np.save(d / f"node_features_{i}.npy", p)
    mesh = make_mesh(8)
    arr, total = load_sharded_node_feat("MAGLIKE", mesh,
                                        data_dir=str(tmp_path))
    full = np.concatenate(parts)
    assert total == 42
    assert arr.shape[0] % 8 == 0 and arr.shape[0] >= 42
    got = np.asarray(arr)[:42]
    np.testing.assert_allclose(got, full, rtol=1e-6)
    # padding rows are zero
    np.testing.assert_allclose(np.asarray(arr)[42:], 0.0)
    with pytest.raises(ValueError):
        load_sharded_node_feat("NOPE", mesh, data_dir=str(tmp_path))
