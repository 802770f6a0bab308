"""Sampling/feature-fetch prefetch pipeline.

Counterpart of the reference's software pipelining: a Python thread
samples the NEXT batch while the current batch trains
(``/root/reference/scripts/offline_edge_prediction.py:343-399``).

On TPU the resident-feature path needs no pipeline — sampling, gathers
and the model step are one fused jit, and XLA's async dispatch already
overlaps the host with the device.  The cache path is different: each
``Cache.fetch_feature`` blocks the host on a device→host transfer of the
sampled MFG ids plus ``np.unique``/flag bookkeeping.  This pipeline moves
that host work onto a worker thread with a bounded queue so it overlaps
batch k's device step — the thread-boundary replacement for the
reference's pinned-staging + sampling thread.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple


class FeaturePipeline:
    """Prefetches ``(batch, mfgs, node_feats, edge_feats,
    target_edge_feats)`` tuples with a worker thread.

    Usage::

        pipe = FeaturePipeline(sampler, cache, depth=2)
        for batch, mfgs, nfs, efs, tef in pipe.run(get_batches(...)):
            state, loss, *_ = trainer.train_step_prefetched(
                state, mfgs, nfs, efs, tef, batch)

    NOTE: cache *state* (flags/counters/buffer) is mutated on the worker
    thread; do not call ``cache.fetch_feature`` concurrently elsewhere.
    The cache's eviction decisions therefore run one batch ahead — the
    same one-batch staleness the reference's pipelined sampler accepts.
    """

    _SENTINEL = object()

    def __init__(self, sampler, cache, depth: int = 2):
        self.sampler = sampler
        self.cache = cache
        self.depth = int(depth)

    def run(self, batches: Iterable) -> Iterator[Tuple]:
        q: "queue.Queue" = queue.Queue(self.depth)
        err: list = []

        def worker():
            try:
                for batch in batches:
                    mfgs = self.sampler.sample(batch.target_nodes,
                                               batch.ts)
                    nfs, efs = self.cache.fetch_feature(mfgs, batch.eids)
                    q.put((batch, mfgs, nfs, efs,
                           self.cache.target_edge_features))
            except BaseException as e:  # surface on the consumer side
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    break
                yield item
        finally:
            # drain so the worker can exit even on early consumer break
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
        if err:
            raise err[0]
