"""Dataset loading, negative sampling and batch iteration.

Behavioral counterpart of ``/root/reference/gnnflow/data.py`` and the loader
half of ``/root/reference/gnnflow/utils.py:40-75,248-339,344-410``:

- ``load_dataset`` reads the same ``edges.csv`` format (columns src, dst,
  time, ext_roll; eid = row index) and splits train/val/test by ``ext_roll``
  searchsorted, exactly like ``utils.py:70-75``.
- ``load_feat`` reads ``node_features.npy`` / ``edge_features.npy``.
- ``DstRandEdgeSampler`` / ``RandEdgeSampler`` mirror ``utils.py:344-378,504``.
- ``EdgePredictionBatch`` iteration mirrors ``EdgePredictionDataset`` +
  ``RandomStartBatchSampler`` (``data.py:17-117``): each batch is
  ``target_nodes=[src|dst|neg]`` (3B), tripled timestamps, positive eids, and
  a random chunk-aligned epoch start offset.

TPU-specific difference: batches are emitted at a **fixed size** (the final
partial batch is padded and carries ``num_valid``) so that the jitted train
step compiles once per batch size instead of once per remainder.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd


def get_project_root_dir() -> str:
    return os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------------------
# Edge tables
# ---------------------------------------------------------------------------

@dataclass
class EdgeTable:
    """A chronological edge list (the contents of one ``edges.csv`` split)."""

    src: np.ndarray   # int64 [E]
    dst: np.ndarray   # int64 [E]
    time: np.ndarray  # float32 [E]
    eid: np.ndarray   # int64 [E]

    def __len__(self) -> int:
        return len(self.src)

    def __getitem__(self, sl) -> "EdgeTable":
        return EdgeTable(self.src[sl], self.dst[sl], self.time[sl],
                         self.eid[sl])

    @classmethod
    def from_dataframe(cls, df: pd.DataFrame) -> "EdgeTable":
        if "eid" in df.columns:
            eid = df["eid"].to_numpy(dtype=np.int64)
        else:
            eid = df.index.to_numpy(dtype=np.int64)
        return cls(
            src=df["src"].to_numpy(dtype=np.int64),
            dst=df["dst"].to_numpy(dtype=np.int64),
            time=df["time"].to_numpy(dtype=np.float32),
            eid=eid,
        )

    @property
    def max_node(self) -> int:
        if len(self) == 0:
            return -1
        return int(max(self.src.max(), self.dst.max()))

    def concat(self, other: "EdgeTable") -> "EdgeTable":
        return EdgeTable(
            np.concatenate([self.src, other.src]),
            np.concatenate([self.dst, other.dst]),
            np.concatenate([self.time, other.time]),
            np.concatenate([self.eid, other.eid]),
        )


def load_dataset(dataset: str, data_dir: Optional[str] = None) \
        -> Tuple[EdgeTable, EdgeTable, EdgeTable, EdgeTable]:
    """Load ``<data_dir>/<dataset>/edges.csv`` and split by ``ext_roll``.

    Returns (train, val, test, full) edge tables, matching
    ``gnnflow/utils.py:40-75``.
    """
    if data_dir is None:
        data_dir = os.path.join(get_project_root_dir(), "data")
    path = os.path.join(data_dir, dataset, "edges.csv")
    if not os.path.exists(path):
        raise ValueError(f"{path} does not exist")
    df = pd.read_csv(path)
    df = df.rename(columns={"Unnamed: 0": "eid"})
    ext_roll = df["ext_roll"].to_numpy()
    train_end = int(np.searchsorted(ext_roll, 1))
    val_end = int(np.searchsorted(ext_roll, 2))
    full = EdgeTable.from_dataframe(df)
    return full[:train_end], full[train_end:val_end], full[val_end:], full


def load_dataset_in_chunks(dataset: str, chunksize: int,
                           data_dir: Optional[str] = None):
    """Stream ``edges.csv`` in chunks (``gnnflow/utils.py:131-152``)."""
    if data_dir is None:
        data_dir = os.path.join(get_project_root_dir(), "data")
    path = os.path.join(data_dir, dataset, "edges.csv")
    offset = 0
    for df in pd.read_csv(path, chunksize=chunksize):
        df = df.rename(columns={"Unnamed: 0": "eid"})
        if "eid" not in df.columns:
            df = df.assign(eid=np.arange(offset, offset + len(df)))
        offset += len(df)
        yield EdgeTable.from_dataframe(df), df["ext_roll"].to_numpy()


def load_feat(dataset: str, data_dir: Optional[str] = None,
              memmap: bool = False):
    """Load node/edge feature matrices (``gnnflow/utils.py:248-339``).

    Returns ``(node_feats, edge_feats)`` as float32 numpy arrays or None.
    """
    if data_dir is None:
        data_dir = os.path.join(get_project_root_dir(), "data")
    mmap_mode = "r" if memmap else None
    node_feats = edge_feats = None
    node_path = os.path.join(data_dir, dataset, "node_features.npy")
    edge_path = os.path.join(data_dir, dataset, "edge_features.npy")
    if os.path.exists(node_path):
        node_feats = np.load(node_path, mmap_mode=mmap_mode)
    if os.path.exists(edge_path):
        edge_feats = np.load(edge_path, mmap_mode=mmap_mode)
    return node_feats, edge_feats


def load_partitioned_dataset(dataset: str, data_dir: Optional[str] = None,
                             rank: int = 0, world_size: int = 1,
                             partition_train_data: bool = False):
    """Load this rank's pre-partitioned splits
    (``edges_{train,val,test}_<world_size>_<rank>.csv``), matching
    ``gnnflow/utils.py:154-186``.  Returns (train, val, test) EdgeTables
    (train is None when ``partition_train_data``)."""
    if data_dir is None:
        data_dir = os.path.join(get_project_root_dir(), "data")
    base = os.path.join(data_dir, dataset)

    def read(split):
        path = os.path.join(base,
                            f"edges_{split}_{world_size}_{rank}.csv")
        if not os.path.exists(path):
            raise ValueError(f"{path} does not exist")
        df = pd.read_csv(path).rename(columns={"Unnamed: 0": "eid"})
        return EdgeTable.from_dataframe(df)

    train = None if partition_train_data else read("train")
    return train, read("val"), read("test")


def load_sharded_node_feat(dataset: str, mesh,
                           data_dir: Optional[str] = None):
    """Assemble a mesh-sharded node-feature table from per-machine part
    files ``node_features_<i>.npy`` (the MAG sharded load,
    ``gnnflow/utils.py:203-246``).

    The reference gathers all parts to rank 0 with send/recv; on TPU
    that materialization is unnecessary — each process memmaps only the
    parts overlapping its addressable shards and the result is one
    globally row-sharded device array (rows padded to the shard
    multiple)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if data_dir is None:
        data_dir = os.path.join(get_project_root_dir(), "data")
    base = os.path.join(data_dir, dataset)
    parts = []
    i = 0
    while os.path.exists(os.path.join(base, f"node_features_{i}.npy")):
        parts.append(np.load(os.path.join(base, f"node_features_{i}.npy"),
                             mmap_mode="r"))
        i += 1
    if not parts:
        raise ValueError(f"no node_features_*.npy parts under {base}")
    offs = np.cumsum([0] + [p.shape[0] for p in parts])
    total, dim = int(offs[-1]), parts[0].shape[1]
    axis = mesh.axis_names[-1]
    n_shards = mesh.shape[axis]
    padded = ((total + n_shards - 1) // n_shards) * n_shards

    def cb(index):
        lo = index[0].start or 0
        hi = index[0].stop if index[0].stop is not None else padded
        out = np.zeros((hi - lo, dim), np.float32)
        for k, p in enumerate(parts):
            s = max(lo, int(offs[k]))
            e = min(hi, int(offs[k + 1]))
            if s < e:
                out[s - lo: e - lo] = p[s - offs[k]: e - offs[k]]
        return out

    arr = jax.make_array_from_callback(
        (padded, dim), NamedSharding(mesh, P(axis)), cb)
    return arr, total


# ---------------------------------------------------------------------------
# Synthetic datasets (no-network environments; deterministic)
# ---------------------------------------------------------------------------

def make_synthetic_dataset(
        num_src: int = 1000, num_dst: int = 200, num_edges: int = 20000,
        dim_node: int = 0, dim_edge: int = 32, seed: int = 0,
        train_frac: float = 0.70, val_frac: float = 0.15,
        bipartite: bool = True, time_scale: float = 1.0,
        recurrence: float = 0.8):
    """Generate a temporal-interaction dataset with learnable structure.

    Mimics the shape of the JODIE datasets (WIKI/REDDIT are bipartite
    user-item interaction streams): node ids ``[0, num_src)`` are sources,
    ``[num_src, num_src+num_dst)`` are destinations.  Each source has a small
    preferred set of destinations and revisits them with probability
    ``recurrence`` — giving temporal models signal to learn.

    Returns ``(train, val, test, full, node_feats, edge_feats)``.
    """
    rng = np.random.RandomState(seed)
    src = rng.randint(0, num_src, size=num_edges).astype(np.int64)

    # Preferred destinations per source (zipfian popularity).
    num_pref = 4
    popularity = 1.0 / (np.arange(num_dst) + 1.0)
    popularity /= popularity.sum()
    pref = rng.choice(num_dst, size=(num_src, num_pref), p=popularity)

    revisit = rng.rand(num_edges) < recurrence
    pref_pick = pref[src, rng.randint(0, num_pref, size=num_edges)]
    rand_pick = rng.choice(num_dst, size=num_edges, p=popularity)
    dst = np.where(revisit, pref_pick, rand_pick).astype(np.int64)
    if bipartite:
        dst = dst + num_src

    # Strictly increasing-ish timestamps (exponential inter-arrival).
    time = np.cumsum(rng.exponential(time_scale, size=num_edges)) \
        .astype(np.float32)
    eid = np.arange(num_edges, dtype=np.int64)

    full = EdgeTable(src, dst, time, eid)
    train_end = int(num_edges * train_frac)
    val_end = int(num_edges * (train_frac + val_frac))

    num_nodes = num_src + num_dst if bipartite else max(num_src, num_dst)
    if dim_node > 0:
        # informative node features: dst nodes get identity embeddings,
        # src nodes the mean embedding of their preferred dsts (so the
        # src·dst product carries link signal for static models)
        dst_base = rng.randn(num_dst, dim_node).astype(np.float32)
        src_base = dst_base[pref].mean(axis=1)
        noise = 0.1 * rng.randn(num_nodes, dim_node).astype(np.float32)
        if bipartite:
            node_feats = np.concatenate([src_base, dst_base]) + noise
        else:
            node_feats = noise
            node_feats[:num_src] += src_base[:num_src]
    else:
        node_feats = None
    # Edge features correlated with the dst identity so they carry signal.
    if dim_edge > 0:
        dst_emb = rng.randn(num_dst, dim_edge).astype(np.float32)
        di = (dst - num_src) if bipartite else dst
        # generated in row chunks: randn consumes the stream in C order,
        # so this is value-identical to one call but never materializes
        # the f64 intermediate (GDELT-scale tables are tens of GB)
        edge_feats = np.empty((num_edges, dim_edge), np.float32)
        step = max(1, (1 << 24) // dim_edge)
        for lo in range(0, num_edges, step):
            hi = min(lo + step, num_edges)
            edge_feats[lo:hi] = dst_emb[di[lo:hi]]
            edge_feats[lo:hi] += (
                0.1 * rng.randn(hi - lo, dim_edge)).astype(np.float32)
    else:
        edge_feats = None
    return (full[:train_end], full[train_end:val_end], full[val_end:], full,
            node_feats, edge_feats)


def write_synthetic_dataset(dataset_dir: str, **kwargs) -> None:
    """Materialize a synthetic dataset in the reference's on-disk format
    (edges.csv + *_features.npy), usable by :func:`load_dataset`."""
    train, val, test, full, node_feats, edge_feats = \
        make_synthetic_dataset(**kwargs)
    os.makedirs(dataset_dir, exist_ok=True)
    ext_roll = np.zeros(len(full), dtype=np.int64)
    ext_roll[len(train):len(train) + len(val)] = 1
    ext_roll[len(train) + len(val):] = 2
    df = pd.DataFrame({
        "src": full.src, "dst": full.dst, "time": full.time,
        "ext_roll": ext_roll})
    df.to_csv(os.path.join(dataset_dir, "edges.csv"), index=True)
    if node_feats is not None:
        np.save(os.path.join(dataset_dir, "node_features.npy"), node_feats)
    if edge_feats is not None:
        np.save(os.path.join(dataset_dir, "edge_features.npy"), edge_feats)


# ---------------------------------------------------------------------------
# Negative samplers (gnnflow/utils.py:344-378, 504-530)
# ---------------------------------------------------------------------------

class DstRandEdgeSampler:
    """Uniformly sample negative destinations from the set of seen dsts."""

    def __init__(self, dst_list, seed: Optional[int] = None):
        self.seed = seed
        self.dst_list = np.unique(dst_list)
        self.random_state = np.random.RandomState(seed)

    def sample(self, size: int) -> np.ndarray:
        idx = self.random_state.randint(0, len(self.dst_list), size)
        return self.dst_list[idx]

    def reset_random_state(self):
        self.random_state = np.random.RandomState(self.seed)

    def add_dst_list(self, dst):
        self.dst_list = np.unique(np.concatenate((self.dst_list, dst)))


class RandEdgeSampler:
    """Sample random (src, dst) pairs (``gnnflow/utils.py:504-530``)."""

    def __init__(self, src_list, dst_list, seed: Optional[int] = None):
        self.seed = seed
        self.src_list = np.unique(src_list)
        self.dst_list = np.unique(dst_list)
        self.random_state = np.random.RandomState(seed)

    def sample(self, size: int):
        src_idx = self.random_state.randint(0, len(self.src_list), size)
        dst_idx = self.random_state.randint(0, len(self.dst_list), size)
        return self.src_list[src_idx], self.dst_list[dst_idx]

    def reset_random_state(self):
        self.random_state = np.random.RandomState(self.seed)


# ---------------------------------------------------------------------------
# Batch iteration
# ---------------------------------------------------------------------------

@dataclass
class Batch:
    """One link-prediction batch.

    ``target_nodes`` is ``[src | dst | neg]`` (3B entries, column blocks) and
    ``ts`` the tripled timestamps — same layout as the reference's
    ``EdgePredictionDataset.__getitem__`` (``gnnflow/data.py:36-52``).  When
    the underlying slice is shorter than the nominal batch size the arrays
    are padded (node id -1, eid 0) and ``num_valid < batch_size``.
    """

    target_nodes: np.ndarray  # int64 [3B]
    ts: np.ndarray            # float32 [3B]
    eids: np.ndarray          # int64 [B]
    num_valid: int            # valid positive edges (<= B)

    @property
    def batch_size(self) -> int:
        return len(self.eids)


def _pad_batch(src, dst, neg, ts, eid, batch_size: int) -> Batch:
    """``neg`` is ``[r, n]`` (r negative blocks) or ``[n]`` (r == 1)."""
    n = len(src)
    neg = np.atleast_2d(np.asarray(neg, dtype=np.int64))
    if n < batch_size:
        pad = batch_size - n
        pad_nid = np.full(pad, -1, dtype=np.int64)
        pad_ts = np.zeros(pad, dtype=np.float32)
        src = np.concatenate([src, pad_nid])
        dst = np.concatenate([dst, pad_nid])
        neg = np.concatenate(
            [neg, np.full((neg.shape[0], pad), -1, np.int64)], axis=1)
        ts = np.concatenate([ts, pad_ts])
        eid = np.concatenate([eid, np.zeros(pad, dtype=np.int64)])
    r = neg.shape[0]
    target_nodes = np.concatenate([src, dst, neg.reshape(-1)])
    ts_all = np.tile(ts, 2 + r)
    return Batch(target_nodes.astype(np.int64), ts_all.astype(np.float32),
                 eid.astype(np.int64), n)


def get_batches(data: EdgeTable, batch_size: int,
                neg_sampler: Optional[DstRandEdgeSampler] = None,
                num_chunks: int = 0,
                rng: Optional[np.random.RandomState] = None,
                pad: bool = True,
                rank: int = 0, world_size: int = 1,
                neg_sample_ratio: int = 1,
                interleave_indices: bool = False) -> Iterator[Batch]:
    """Iterate fixed-size batches over a chronological edge table.

    ``num_chunks > 0`` enables the reference's random epoch start: skip a
    random multiple of ``batch_size // num_chunks`` edges at the front
    (``RandomStartBatchSampler.reset``, ``gnnflow/data.py:108-117``).

    ``world_size > 1`` splits batches across ranks.  Two modes:

    - ``interleave_indices=True`` — exact ``DistributedBatchSampler``
      semantics (``gnnflow/data.py:154-171``): rank r takes every
      world_size-th *index* (``idx % world_size == rank``) and packs
      batch_size of them per batch.
    - default — round-robin whole *batches* across ranks, which keeps each
      rank's stream chronological (the natural fit for GSPMD
      batch-sharding, where per-device sub-batches come from one global
      batch anyway).
    """
    start = 0
    if num_chunks > 0:
        if rng is None:
            rng = np.random.RandomState()
        start = rng.randint(0, num_chunks) * (batch_size // num_chunks)
    n = len(data)

    def batch_index_arrays():
        if interleave_indices and world_size > 1:
            idx = np.arange(start + ((rank - start) % world_size), n,
                            world_size)
            for lo in range(0, len(idx), batch_size):
                yield idx[lo: lo + batch_size]
        else:
            batch_idx = 0
            for lo in range(start, n, batch_size):
                take = (batch_idx % world_size) == rank
                batch_idx += 1
                if take:
                    yield np.arange(lo, min(lo + batch_size, n))

    for sel in batch_index_arrays():
        src = data.src[sel]
        dst = data.dst[sel]
        ts = data.time[sel]
        eid = data.eid[sel]
        k = len(sel)
        if neg_sampler is not None:
            neg = neg_sampler.sample(
                neg_sample_ratio * k).reshape(neg_sample_ratio, k)
        else:
            neg = np.full((neg_sample_ratio, k), -1, dtype=np.int64)
        yield _pad_batch(src, dst, neg, ts, eid,
                         batch_size if pad else k)
