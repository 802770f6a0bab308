"""Data-layer tests (counterpart of the reference ``tests/test_dataset.py``):
on-disk format round-trip, split semantics, fixed-size batch iteration,
negative samplers, chunked loading."""
import numpy as np
import pytest

from gnnflow_tpu.data import (DstRandEdgeSampler, RandEdgeSampler,
                              get_batches, load_dataset,
                              load_dataset_in_chunks, load_feat,
                              make_synthetic_dataset,
                              write_synthetic_dataset)


def test_write_load_roundtrip(tmp_path):
    d = tmp_path / "SYN"
    write_synthetic_dataset(str(d), num_src=50, num_dst=20,
                            num_edges=500, dim_edge=8, dim_node=4, seed=1)
    train, val, test, full = load_dataset("SYN", str(tmp_path))
    assert len(full) == 500
    assert len(train) == 350 and len(val) == 75 and len(test) == 75
    assert (np.diff(full.time) >= 0).all()
    assert full.eid.tolist() == list(range(500))
    nf, ef = load_feat("SYN", str(tmp_path))
    assert nf.shape == (70, 4)
    assert ef.shape == (500, 8)
    # matches the in-memory generator
    t2, v2, te2, f2, nf2, ef2 = make_synthetic_dataset(
        num_src=50, num_dst=20, num_edges=500, dim_edge=8, dim_node=4,
        seed=1)
    np.testing.assert_array_equal(full.src, f2.src)
    np.testing.assert_allclose(ef, ef2, rtol=1e-6)


def test_load_missing_dataset_raises(tmp_path):
    with pytest.raises(ValueError):
        load_dataset("NOPE", str(tmp_path))


def test_chunked_loading(tmp_path):
    d = tmp_path / "SYN"
    write_synthetic_dataset(str(d), num_src=20, num_dst=10,
                            num_edges=300, dim_edge=0, seed=0)
    chunks = list(load_dataset_in_chunks("SYN", 100, str(tmp_path)))
    assert len(chunks) == 3
    total = sum(len(c[0]) for c in chunks)
    assert total == 300
    eids = np.concatenate([c[0].eid for c in chunks])
    np.testing.assert_array_equal(eids, np.arange(300))


def test_batches_fixed_size_and_padding():
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=30, num_dst=10, num_edges=1050, dim_edge=0, seed=0)
    neg = DstRandEdgeSampler(full.dst, seed=0)
    batches = list(get_batches(full, 100, neg))
    assert len(batches) == 11
    for b in batches[:-1]:
        assert b.batch_size == 100 and b.num_valid == 100
    last = batches[-1]
    assert last.batch_size == 100 and last.num_valid == 50
    # padded rows carry nid -1
    assert (last.target_nodes[50:100] == -1).all()
    # layout: [src | dst | neg]
    b = batches[0]
    np.testing.assert_array_equal(b.target_nodes[:100], full.src[:100])
    np.testing.assert_array_equal(b.target_nodes[100:200], full.dst[:100])
    np.testing.assert_array_equal(b.ts[:100], full.time[:100])
    np.testing.assert_array_equal(b.ts[100:200], full.time[:100])


def test_batches_random_chunk_start():
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=30, num_dst=10, num_edges=1000, dim_edge=0, seed=0)
    neg = DstRandEdgeSampler(full.dst, seed=0)
    rng = np.random.RandomState(3)
    starts = set()
    for _ in range(10):
        b0 = next(iter(get_batches(full, 100, neg, num_chunks=4,
                                   rng=rng)))
        starts.add(int(b0.eids[0]))
    # random start offsets are multiples of batch_size//num_chunks = 25
    assert all(s % 25 == 0 for s in starts)
    assert len(starts) > 1


def test_batches_world_size_round_robin():
    _, _, _, full, _, _ = make_synthetic_dataset(
        num_src=30, num_dst=10, num_edges=800, dim_edge=0, seed=0)
    neg = DstRandEdgeSampler(full.dst, seed=0)
    seen = []
    for rank in range(2):
        for b in get_batches(full, 100, neg, rank=rank, world_size=2):
            seen.append((rank, int(b.eids[0])))
    firsts = sorted(e for _, e in seen)
    assert firsts == [0, 100, 200, 300, 400, 500, 600, 700]
    r0 = [e for r, e in seen if r == 0]
    assert r0 == [0, 200, 400, 600]


def test_neg_samplers():
    dsts = np.array([5, 7, 7, 9])
    s = DstRandEdgeSampler(dsts, seed=0)
    out = s.sample(100)
    assert set(out.tolist()) <= {5, 7, 9}
    s.add_dst_list(np.array([11]))
    out = s.sample(500)
    assert 11 in out.tolist()
    # seeded determinism
    s1 = DstRandEdgeSampler(dsts, seed=42)
    s2 = DstRandEdgeSampler(dsts, seed=42)
    np.testing.assert_array_equal(s1.sample(50), s2.sample(50))
    s1.reset_random_state()
    np.testing.assert_array_equal(s1.sample(50), s2.sample(50)[:0].tolist()
                                  if False else s1.dst_list[
        np.random.RandomState(42).randint(0, len(s1.dst_list), 50)])

    rs = RandEdgeSampler(np.array([1, 2]), dsts, seed=0)
    src, dst = rs.sample(10)
    assert set(src.tolist()) <= {1, 2}
    assert set(dst.tolist()) <= {5, 7, 9}
