"""Training engine: the fused jitted train/eval step.

The reference splits each iteration across host threads and CUDA streams —
sampling thread, pinned-buffer feature staging, memory fetch, model
forward/backward, memory write-back
(``/root/reference/scripts/offline_edge_prediction.py:343-454``).  On TPU the
entire iteration is **one XLA program**: sampling (binary search + gathers),
feature gathers, attention, loss, Adam update and memory write-back are
fused into a single jit — no host round-trips, no pipeline threads needed.

Under a device mesh the same function runs data-parallel: shard the batch
along the ``data`` axis, keep params/memory/graph replicated, and GSPMD
inserts the gradient all-reduce automatically (the DDP-equivalent,
``offline_edge_prediction.py:274-275``).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gnnflow_tpu.common import MFG
from gnnflow_tpu.dynamic_graph import DeviceGraph
from gnnflow_tpu.models import memory as memory_lib
from gnnflow_tpu.models.dgnn import DGNN
from gnnflow_tpu.ops.sampling import sample_hops


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    memory: Optional[memory_lib.MemoryState]
    key: jax.Array
    step: jax.Array
    # in-loop layer-dedup feedback (configs with _layer_dedup_ok only):
    # [4] i32 histogram of the first boundary's take per step — index =
    # number of tier caps the unique count exceeded (0 = tightest tier,
    # 3 = clamped tail / padded fallback).  Read by tier_take_stats();
    # maybe_recalibrate() re-runs calibration when the fallback rate
    # shows the stream drifted from the calibrated distribution.
    tier_takes: Optional[jax.Array] = None


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise torch BCEWithLogitsLoss."""
    return jnp.maximum(logits, 0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def link_pred_loss(pos: jax.Array, neg: jax.Array, valid: jax.Array,
                   neg_ratio: int = 1) -> jax.Array:
    """Masked mean(BCE(pos, 1)) + mean(BCE(neg, 0)) — the reference's
    ``criterion(pos) + criterion(neg)`` with padded rows excluded.
    ``neg`` may hold ``neg_ratio`` negatives per positive ([r·B, 1])."""
    w = valid.astype(jnp.float32)[:, None]
    wn = jnp.tile(w, (neg_ratio, 1)) if neg_ratio > 1 else w
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return (jnp.sum(bce_with_logits(pos, jnp.ones_like(pos)) * w) / denom
            + jnp.sum(bce_with_logits(neg, jnp.zeros_like(neg)) * wn)
            / (denom * neg_ratio))


def pad_feature_table(table, lanes: int = 128, dtype=None):
    """Zero-pad feature rows to a lane multiple.

    TPU row gathers from 128-aligned rows run ~2x faster than from odd
    widths (measured: [672k, 172] f32 gather 3.7 ms vs 1.8 ms at width
    256 for 120k rows on v5e).  ``fetch_features`` slices the pad back
    off, and the slice fuses into the consumers.

    ``dtype=jnp.bfloat16`` halves the table's HBM footprint — an HBM
    *capacity* knob for oversize tables.  It is NOT a throughput knob:
    measured on v5e, the bf16 table improves the isolated gather stage
    (+1.48 -> +1.08 ms) but regresses the full step ~3% (row gathers are
    per-row latency-bound, and the narrow rows cost convert work in the
    consumers) — see BASELINE.md negative results."""
    if table is None:
        return None
    d = table.shape[1]
    pad = (-d) % lanes
    t = jnp.asarray(table)
    if dtype is not None:
        t = t.astype(dtype)
    return t if pad == 0 else jnp.pad(t, ((0, 0), (0, pad)))


def _gather_rows(table: Optional[jax.Array], ids: jax.Array,
                 valid: jax.Array,
                 dim: Optional[int] = None) -> Optional[jax.Array]:
    """Feature gather with padded-id masking (invalid rows zeroed).

    ``dim`` slices lane-padded tables (see :func:`pad_feature_table`)
    back to the true feature width.  Indices are flattened before the
    gather (2-D index gathers lower to a slower XLA path)."""
    if table is None:
        return None
    flat = jnp.clip(ids.reshape(-1), 0, table.shape[0] - 1)
    rows = table[flat].reshape(ids.shape + (table.shape[1],))
    if dim is not None and dim < table.shape[1]:
        rows = rows[..., :dim]
    extra = rows.ndim - valid.ndim
    return jnp.where(valid.reshape(valid.shape + (1,) * extra), rows, 0)


def fetch_features(mfgs: List[List[MFG]],
                   node_feats: Optional[jax.Array],
                   edge_feats: Optional[jax.Array],
                   dim_node: Optional[int] = None,
                   dim_edge: Optional[int] = None,
                   edge_major: bool = False):
    """HBM-resident feature fetch (the ``Cache.fetch_feature`` fast path,
    ``gnnflow/cache/cache.py:255``, when everything fits on device).
    ``dim_node``/``dim_edge`` slice lane-padded tables back to the true
    width.

    ``edge_major=True`` gathers edge features in f-major order and
    returns [F, B, de] arrays (the DGNN edge-major attention layout —
    the f-major flat gather reshapes to its 3-D form as a pure bitcast,
    where the b-major gather pays a sublane retile)."""
    nfs = []
    for mfg in mfgs[0]:
        nfs.append(_gather_rows(node_feats, mfg.all_nodes(),
                                mfg.all_mask(), dim_node))
    efs = []
    for layer in mfgs:
        row = []
        for mfg in layer:
            eids = mfg.nbr_eids.T if edge_major else mfg.nbr_eids
            emask = mfg.nbr_mask.T if edge_major else mfg.nbr_mask
            row.append(_gather_rows(edge_feats, eids, emask, dim_edge))
        efs.append(row)
    return nfs, efs


class Trainer:
    """Builds jitted train/eval steps for a DGNN + sampler configuration."""

    # which model-level fast paths this trainer's step may take.
    # PartitionedTrainer narrows this: the dedup paths compose with
    # routed sampling (per-layer compact roots route like any roots),
    # but block compaction's packed-root sampling is single-store only.
    _fast_paths = frozenset({"snapshot_dedup", "model_compact",
                             "layer_dedup"})

    def __init__(self, model: DGNN, *, fanouts, sample_strategy="recent",
                 num_snapshots=1, snapshot_time_window=0.0, prop_time=False,
                 is_static=False, lr=1e-4, optimizer=None,
                 neg_sample_ratio=1, memory_storage="float32",
                 compact_factor="auto", dedup_factor="auto",
                 gru_table="auto", model_compact="auto",
                 layer_dedup="auto", apan_table="auto",
                 auto_calibrate="auto"):
        self.model = model
        # f-leading edge-feature layout (DGNN.edge_major): fetch_features
        # must gather [F, B, de] arrays for the attention stack
        self._edge_major = bool(getattr(model, "edge_major", False)) \
            and getattr(model, "attention_impl", "xla") == "xla"
        self.fanouts = tuple(int(f) for f in fanouts)
        self.strategy = sample_strategy
        self.num_snapshots = int(num_snapshots)
        self.window = float(snapshot_time_window)
        self.prop_time = bool(prop_time)
        # calibration only re-picks knobs the user left on "auto" —
        # explicit values (including explicit None) are a decision
        self._auto_knobs = {"compact": compact_factor == "auto",
                            "dedup": dedup_factor == "auto",
                            "layer_dedup": layer_dedup == "auto"}
        if compact_factor == "auto":
            # windowed multi-snapshot configs leave most neighbor slots
            # empty — compact deeper sampling layers (see sampling.py)
            compact_factor = (0.25 if self.num_snapshots > 1
                              and self.window > 0 else None)
        self.compact_factor = compact_factor
        self.is_static = bool(is_static)
        if dedup_factor == "auto":
            # Opt-in for now.  The memory updater's output is a pure
            # function of (nid, ts) and measured streams repeat pairs
            # heavily (only ~13-17% of the 132k instances are unique at
            # the REDDIT-scale headline), so the GRU compute + memory
            # pull can be deduplicated exactly — but on v5e the sort /
            # scatter machinery (2-key sort ~1 ms, inverse-map scatter
            # ~0.35 ms) plus the expansion VJP costs slightly more than
            # the ~2.3 ms the 3x-smaller GRU saves (measured 11.0 vs
            # 10.25 ms/step; see BASELINE.md negative results).  The
            # machinery is kept (with the sorted-segment-sum Pallas
            # kernel for the expansion transpose) for larger fanout /
            # deeper configs where the duplicated-compute fraction is
            # higher.
            dedup_factor = None
        self.dedup_factor = dedup_factor
        if model_compact == "auto":
            # keep deeper-layer MFGs compact through feats + attention
            # for windowed multi-snapshot multi-layer models (DySAT
            # family): the padded design otherwise pays full feature-
            # gather + attention cost for mostly-empty snapshot windows.
            # Exact up to dropout-draw assignment (overflow falls back
            # to the padded path via per-boundary lax.conds).
            model_compact = (self.num_snapshots > 1 and self.window > 0
                             and len(self.fanouts) >= 2
                             and not model.use_memory)
        self.model_compact = bool(model_compact)
        if layer_dedup == "auto":
            # deeper-layer (nid, ts) dedup for multi-layer single-
            # snapshot attention models (TGAT family): layer i+1 roots
            # are layer i's all_nodes, of which only ~13-25% are unique
            # (nid, ts) pairs at measured streams — sampling + feature-
            # gathering + attention over the unique set and expanding
            # embeddings at the boundary cuts the deeper layer ~4x.
            # Auto-calibration (first batch) picks the capacity factor;
            # overflow falls back to the padded path (lax.cond), so
            # results never change (up to dropout-draw assignment).
            layer_dedup = None   # calibrate() picks it from the stream
        self.layer_dedup = layer_dedup
        # Deeper (layer >= 2) boundaries dedup at their OWN cap factor,
        # decoupled from the layer-1 ladder's top tier: the ladder top
        # carries 1.25x overflow headroom, and inheriting it inflated
        # every deep boundary's work ~20% on the 3-layer config
        # (auto 245.6 vs the fitted-deep-cap shape's 200.2 ms/step).
        # None = inherit the ladder's largest tier (manual-ladder
        # semantics unchanged); calibrate() fits it for deep configs.
        self.layer_dedup_deep = None
        if self.layer_dedup is not None and not self._layer_dedup_ok():
            raise ValueError(
                "layer_dedup requires a multi-layer DGNN without memory "
                "(TGAT family; windowed multi-snapshot DySAT family) or "
                "a multi-layer static SAGE/GAT")
        if apan_table == "auto":
            # pre-projected K/V table pull for the APAN transformer
            # updater: measured 61 -> ~40 ms/step at the headline (the
            # [L, S, dr] raw-mail pull and its ~14 ms of layout copies
            # disappear).  Identical math (matmul-then-gather); the
            # bf16-packed storage layout has no f32 column view, so it
            # keeps the per-instance pull.
            apan_table = (getattr(model, "memory_updater", "gru")
                          == "transformer")
        self.apan_table = bool(apan_table)
        if gru_table == "auto":
            # Opt-in.  The per-node gate pre-projection
            # (ops/gru_gather.py) hoists the GRU's node-dependent
            # matmuls out of instance space — identical math — but once
            # the bf16-packed pull landed (prepare_input_bf16) the plain
            # path is faster everywhere measured: headline 9.34 vs
            # 10.15 ms/step (the table path's expansion-gather layout
            # copies outweigh the hoisted matmuls).  Kept fully tested
            # for configs with much wider mails relative to N.
            gru_table = False
        self.gru_table = bool(gru_table)
        if self.gru_table and (
                not model.use_memory
                or getattr(model, "memory_updater", "gru") != "gru"
                or getattr(model, "mailbox_slots", 1) != 1):
            raise ValueError(
                "gru_table requires use_memory with the GRU updater and "
                "a single-slot mailbox (the per-node gate pre-projection "
                "is GRU math; APAN's transformer updater and multi-slot "
                "mailboxes have no table form)")
        self.tx = optimizer if optimizer is not None else optax.adam(lr)
        self.neg_ratio = int(neg_sample_ratio)
        self.memory_storage = str(memory_storage)
        model_ratio = int(getattr(model, "neg_sample_ratio", 1))
        if model_ratio != self.neg_ratio:
            raise ValueError(
                f"model neg_sample_ratio={model_ratio} != trainer "
                f"neg_sample_ratio={self.neg_ratio}")

        if auto_calibrate == "auto":
            # the compaction caps depend on measured stream stats
            # (window occupancy / (nid, ts) duplication), so calibrate
            # on the first real batches with no flag.  Only configs with
            # something LEFT ON AUTO to calibrate pay the one-time
            # sampling pass: windowed multi-snapshot (compact /
            # layer-dedup factors), memory (dedup factor), or
            # multi-layer single-snapshot DGNNs (layer_dedup factor).
            auto_calibrate = (
                (self.num_snapshots > 1 and self.window > 0
                 and (self._auto_knobs["compact"]
                      or self._auto_knobs["layer_dedup"]))
                or (model.use_memory and self._auto_knobs["dedup"])
                or (self._layer_dedup_ok()
                    and self._auto_knobs["layer_dedup"]))
        self._calibrated = not bool(auto_calibrate)

        self._jit_train_kwargs = {}
        self._rejit()

    def _layer_dedup_ok(self) -> bool:
        """Is this a config the deeper-layer (nid, ts) dedup supports?
        Multi-layer DGNN without memory — single-snapshot (TGAT family,
        :meth:`_layer_dedup_outputs`) or windowed multi-snapshot (DySAT
        family, :meth:`_snapshot_dedup_outputs`, per-snapshot dedup) —
        and multi-layer static SAGE/GAT.  NB: like the reference
        (``temporal_sampler.py:108-110``), static deeper layers sample
        at the parent EDGE's timestamp, so the key stays (nid, ts);
        with uniform sampling from long histories those pairs are
        mostly unique (measured 0.82 at the REDDIT-scale static
        config) and calibration disables the path — it pays off for
        recent-strategy / short-history static streams."""
        if len(self.fanouts) < 2:
            return False
        if isinstance(self.model, DGNN):
            return (not self.is_static and not self.model.use_memory
                    and (self.num_snapshots == 1 or self.window > 0))
        from gnnflow_tpu.models.static import GAT, SAGE
        return (isinstance(self.model, (SAGE, GAT)) and self.is_static
                and self.num_snapshots == 1)

    def _rejit(self):
        """(Re)build the jitted steps — the single place calibration and
        DP sharding changes funnel through, so a post-``shard_trainer``
        ``calibrate()`` keeps the GSPMD shardings."""
        self._train_step = jax.jit(self._step, static_argnums=(8,),
                                   donate_argnums=(0,),
                                   **self._jit_train_kwargs)
        self._pre_step = jax.jit(self._step_prefetched,
                                 static_argnums=(7,), donate_argnums=(0,))
        if hasattr(self, "_scan_step"):
            del self._scan_step  # rebuilt lazily with the new factors

    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array, dg: DeviceGraph,
                   batch_size: int,
                   node_feats: Optional[jax.Array],
                   edge_feats: Optional[jax.Array],
                   num_nodes: int) -> TrainState:
        """Initialize params/opt/memory with a dummy batch.

        ``node_feats``/``edge_feats`` may be None even when the model has
        feature dims (the prefetched/cache mode — e.g. host-resident
        tables): zero dummies of the right shape are used for shape
        inference."""
        b3 = batch_size * (2 + self.neg_ratio)
        roots = self._init_array(np.zeros((b3,), np.int32))
        ts = self._init_array(np.zeros((b3,), np.float32))
        mfgs = self._sample(dg, roots, ts, key)
        # normalize to the default (accelerator) device — host-placement
        # stores sample on the CPU backend.  Never touch sharded
        # (multi-device) MFGs.
        devs = mfgs[0][0].root_nids.devices()
        dev = jax.devices()[0]
        if len(devs) == 1 and next(iter(devs)) != dev:
            mfgs = jax.device_put(mfgs, dev)
        dim_node = getattr(self.model, "dim_node", 0)
        dim_edge = getattr(self.model, "dim_edge", 0)
        nfs, efs = fetch_features(mfgs, node_feats, edge_feats,
                                  dim_node or None, dim_edge or None,
                                  edge_major=self._edge_major)
        if node_feats is None and dim_node > 0:
            nfs = [jnp.zeros((m.num_all, dim_node)) for m in mfgs[0]]
        if edge_feats is None and dim_edge > 0:
            efs = [[jnp.zeros((m.fanout, m.num_dst, dim_edge)
                               if self._edge_major else
                               (m.num_dst, m.fanout, dim_edge))
                    for m in layer] for layer in mfgs]
        mem_input = None
        memory = None
        if self.model.use_memory:
            memory = self._init_memory(num_nodes)
            mem_input = self._mem_input(memory, mfgs[0][0])
        # jit the whole init: eager op-by-op dispatch is pathologically
        # slow on remote-compile device tunnels
        init_fn = jax.jit(
            lambda k, mfgs, nfs, efs, mem: self.model.init(
                {"params": k, "dropout": k}, mfgs, nfs, efs, mem,
                train=True))
        params = init_fn(key, mfgs, nfs, efs, mem_input)["params"]
        opt_state = jax.jit(self.tx.init)(params)
        return TrainState(params=params, opt_state=opt_state,
                          memory=memory, key=self._replicated(key),
                          step=self._replicated(
                              np.zeros((), np.int32)),
                          tier_takes=self._replicated(
                              np.zeros((4,), np.int32))
                          if self._layer_dedup_ok() else None)

    def _init_array(self, x: np.ndarray) -> jax.Array:
        """Placement hook for init-time dummy batches; the multi-process
        PartitionedTrainer overrides this to build global arrays."""
        return jnp.asarray(x)

    def _replicated(self, x) -> jax.Array:
        """Placement hook for small replicated state (PRNG key, step)."""
        return jnp.asarray(x)

    def _init_memory(self, num_nodes: int):
        """Memory-state construction hook (overridden to shard globally
        in partitioned/multi-process mode)."""
        return memory_lib.init_memory(
            num_nodes, self.model.dim_memory, self.model.dim_edge,
            mailbox_slots=getattr(self.model, "mailbox_slots", 1),
            storage=self.memory_storage)

    @staticmethod
    def _iters(dg) -> int:
        return getattr(dg, "search_iters", None) or \
            max(1, int(dg.e_ts.shape[-1]).bit_length())

    def _sample(self, dg, roots, ts, key):
        """Sampling hook; overridden by :class:`PartitionedTrainer`."""
        return sample_hops(
            dg, roots, ts, fanouts=self.fanouts, strategy=self.strategy,
            num_snapshots=self.num_snapshots, window=self.window,
            prop_time=self.prop_time, search_iters=self._iters(dg),
            compact_factor=self.compact_factor, key=key)

    def _pre_calibrate(self, dg) -> None:
        """Host-side hook before calibration probes trace (the jitted
        probe sampler sees ``dg`` as tracers); PartitionedTrainer
        resolves its routing capacity here."""

    def _sample_plain(self, dg, roots, ts, key):
        """Uncompacted multi-layer sampling for calibration probes;
        overridden by :class:`PartitionedTrainer` (partitioned stores
        have no single-store ``sample_hops`` view)."""
        return sample_hops(
            dg, roots, ts, fanouts=self.fanouts, strategy=self.strategy,
            num_snapshots=self.num_snapshots, window=self.window,
            prop_time=self.prop_time, search_iters=self._iters(dg),
            compact_factor=None, key=key)

    def _sample_layer(self, dg, roots, ts, *, fanout, key=None):
        """One layer/snapshot sample — the dedup fast-path chains build
        layers one at a time through this hook so
        :class:`PartitionedTrainer` can route each compact layer over
        the mesh."""
        from gnnflow_tpu.ops.sampling import sample_layer
        return sample_layer(
            dg, roots, ts, fanout=fanout, strategy=self.strategy,
            num_snapshots=self.num_snapshots, window=self.window,
            prop_time=self.prop_time, search_iters=self._iters(dg),
            key=key)

    def _sample_layer_snaps(self, dg, R, T, *, fanout,
                            shared_roots=False, key=None):
        """All snapshots of one layer ([S, B] roots) -> list of S MFGs;
        partitioned override samples each snapshot routed."""
        from gnnflow_tpu.ops.sampling import sample_layer_snapshots
        return sample_layer_snapshots(
            dg, R, T, fanout=fanout, strategy=self.strategy,
            num_snapshots=self.num_snapshots, window=self.window,
            prop_time=self.prop_time, search_iters=self._iters(dg),
            shared_roots=shared_roots, key=key)

    # ------------------------------------------------------------------

    def calibrate(self, dg: DeviceGraph, batches, *, key=None,
                  max_batches: int = 3, occ_batches=()) -> dict:
        """Choose the static compaction knobs from measured batch stats.

        ``compact_factor`` (inter-layer sampling compaction) and
        ``dedup_factor`` ((nid, ts) GRU dedup) are static capacities: set
        too low they overflow into the ``lax.cond`` fallback every step
        (paying the machinery for nothing), set too high they waste
        compute on padding.  The right values depend on the stream —
        e.g. deeper-layer occupancy is ~10% at snapshot window 1000 but
        ~55% at window 10000 on the same graph.  This samples a few real
        batches uncompacted, measures occupancy and unique-pair
        fractions, picks factors with ~1.4x headroom (disabled when the
        measured benefit is too small to beat the machinery — see
        BASELINE.md), and re-jits the step.

        Args:
            dg: the device graph to sample against.
            batches: iterable of batch objects (``target_nodes``/``ts``).
            key: PRNG key for uniform sampling (default: key(0)).

        Returns:
            dict of the measured stats and chosen factors.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        self._calibrated = True
        self._pre_calibrate(dg)
        occ = []
        host = self._host_mfgs   # multi-process trainers all-gather
        uniq_frac = []
        boundary_frac = []
        # jit the probe sampler: eager op-by-op dispatch is pathologically
        # slow on tunneled device runtimes, and every probe batch shares
        # one shape -> one compile, N fast executions
        _sample_probe = jax.jit(
            lambda dg_, r_, t_: self._sample_plain(dg_, r_, t_, key))
        n = 0
        for batch in batches:
            if n >= max_batches:
                break
            n += 1
            if isinstance(batch, tuple):
                roots, ts = batch
            else:
                roots, ts = batch.target_nodes, batch.ts
            ts = np.asarray(ts, np.float32)
            if self.is_static:
                ts = np.full_like(ts, np.float32(3.4e38))
            roots, ts = self._probe_batch(roots, ts)
            mfgs = host(_sample_probe(dg, roots, ts))
            # occupancy of non-innermost layers' neighbor slots = the
            # deeper layers' root-compaction opportunity
            for layer in mfgs[1:]:
                for m in layer:
                    occ.append(float(np.asarray(m.nbr_mask).mean()))
            if self.model.use_memory:
                m = mfgs[0][0]
                nid = np.asarray(m.all_nodes())
                mts = np.asarray(m.all_ts()).view(np.int32)
                valid = np.asarray(m.all_mask())
                pairs = np.stack([nid[valid], mts[valid]], 1)
                u = np.unique(pairs, axis=0).shape[0]
                uniq_frac.append(u / max(nid.size, 1))
            if self._layer_dedup_ok():
                # unique (nid, ts) fraction at each layer boundary (the
                # parent layers' all_nodes = the deeper layers' roots);
                # one (layer-1, worst) PAIR per probe batch: the ladder
                # applies only at the layer-1 boundary (round 5) so its
                # tiers size from the OUTERMOST layer's uniqueness,
                # while the largest cap must still hold at every
                # boundary (deeper boundaries take caps[-1])
                us = []
                for layer in mfgs[1:]:
                    lu = 0.0
                    for m in layer:
                        nid = np.asarray(m.all_nodes())
                        mts = np.asarray(m.all_ts()).view(np.int32)
                        va = np.asarray(m.all_mask())
                        pairs = np.stack([nid[va], mts[va]], 1)
                        u = np.unique(pairs, axis=0).shape[0]
                        lu = max(lu, u / max(nid.size, 1))
                    us.append(lu)
                # (layer-1 u, deepest-boundary worst u): mfgs[1:] runs
                # innermost+1 -> outermost; the outermost feeds the
                # layer-1 boundary where the ladder applies, deeper
                # boundaries get their own fitted cap
                boundary_frac.append(
                    (us[-1], max(us[:-1]) if len(us) > 1 else 0.0))
        # worst-case pseudo-batches (the first batch's ts pattern
        # SHIFTED to the stream end — realistic timestamp multiplicity,
        # maximal window fill and history length): none of the
        # compaction stats are stream-stationary, so these bound every
        # cap (window occupancy, boundary uniqueness, memory-instance
        # uniqueness) at the stream's worst case
        windowed = self.num_snapshots > 1 and self.window > 0
        for roots, ts in occ_batches:
            if not windowed and not self._layer_dedup_ok() \
                    and not self.model.use_memory:
                break
            ts_b = np.asarray(ts, np.float32)
            if self.is_static:
                ts_b = np.full_like(ts_b, np.float32(3.4e38))
            r_b, ts_b = self._probe_batch(roots, ts_b)
            mfgs = host(_sample_probe(dg, r_b, ts_b))
            if self.model.use_memory:
                # memory-instance uniqueness is NOT stream-stationary
                # either (recent picks overlap less as histories grow:
                # measured 0.09 -> 0.44 over the synthetic REDDIT-scale
                # epoch) — the worst case sizes the dedup cap
                m = mfgs[0][0]
                nid = np.asarray(m.all_nodes())
                mts = np.asarray(m.all_ts()).view(np.int32)
                va = np.asarray(m.all_mask())
                pairs = np.stack([nid[va], mts[va]], 1)
                u = np.unique(pairs, axis=0).shape[0]
                uniq_frac.append(u / max(nid.size, 1))
            us = []
            for layer in mfgs[1:]:
                lu = 0.0
                for m in layer:
                    if windowed:
                        occ.append(float(np.asarray(m.nbr_mask).mean()))
                    if self._layer_dedup_ok():
                        # boundary uniqueness is NOT stream-stationary:
                        # uniform picks from a growing history make
                        # late-stream pairs nearly all unique (measured
                        # 0.09 -> 0.83 over the synthetic REDDIT-scale
                        # epoch) — the pseudo-batch quantile spread
                        # feeds the tier ladder above
                        nid = np.asarray(m.all_nodes())
                        mts = np.asarray(m.all_ts()).view(np.int32)
                        va = np.asarray(m.all_mask())
                        pairs = np.stack([nid[va], mts[va]], 1)
                        u = np.unique(pairs, axis=0).shape[0]
                        lu = max(lu, u / max(nid.size, 1))
                us.append(lu)
            if self._layer_dedup_ok():
                boundary_frac.append(
                    (us[-1], max(us[:-1]) if len(us) > 1 else 0.0))
        stats = {"occupancy": max(occ) if occ else None,
                 "uniq_frac": max(uniq_frac) if uniq_frac else None,
                 "boundary_uniq_frac": max(m for _, m in boundary_frac)
                 if boundary_frac else None}
        changed = False
        if occ and windowed and self._auto_knobs["compact"]:
            o = stats["occupancy"]
            new = round(min(0.9, 1.4 * o + 0.02), 2) if o < 0.6 else None
            if new != self.compact_factor:
                self.compact_factor = new
                changed = True
        if uniq_frac and self._auto_knobs["dedup"]:
            u = stats["uniq_frac"]
            if getattr(self.model, "memory_updater", "gru") == "gru":
                # the GRU dedup saves only the GRU gates + pull; the
                # sort machinery (~2 ms at L=132k) only pays when the
                # duplicate fraction is extreme (measured: loses at
                # uniq_frac 0.17, see BASELINE.md)
                new = round(min(0.35, 2.5 * u + 0.02), 2) if u <= 0.08 \
                    else None
            else:
                # transformer (APAN): dedup shrinks the ENTIRE updater
                # (pull + K/V + attention + LayerNorm), measured 55 ->
                # ~35 ms/step at uniq_frac ~0.13 (BASELINE.md round 3)
                # — worth it up to much higher unique fractions.  ``u``
                # is the worst case over real + stream-end-shifted
                # pseudo-batches (recent-pick overlap shrinks as
                # histories grow, 0.09 -> 0.44 over the synthetic
                # epoch), so the headroom is small.
                new = round(min(0.7, 1.25 * u + 0.03), 2) if u <= 0.5 \
                    else None
            if new != self.dedup_factor:
                self.dedup_factor = new
                changed = True
        if boundary_frac and self._auto_knobs["layer_dedup"]:
            # DISTRIBUTION-aware tiered caps (round 4): boundary
            # uniqueness is not stream-stationary (uniform picks from a
            # growing unwindowed history push it 0.09 -> ~0.85 over the
            # synthetic REDDIT-scale epoch), so a single worst-case cap
            # either overflows mid-stream or forfeits the early/mid
            # wins (round 3's 0.45 gate left TGAT fully padded).  The
            # per-boundary ``lax.cond`` is exact at any cap, so size a
            # SMALL ladder of caps from the measured per-probe quantiles
            # — each batch takes the tightest tier its unique count
            # fits, and only the true tail pays the padded path.  Tiers
            # above ~0.85 can't beat the sort machinery (the engaged
            # step is ~(shallow + tier·deep); measured deep fraction
            # ~0.8 at TGAT/DySAT headlines) and are dropped.
            # Early/mid tiers size from the LAYER-1 boundary (the only
            # boundary the ladder applies at since round 5 — measured:
            # a (0.45, 0.7) ladder 200.2 ms/step vs the worst-boundary
            # single 0.84 tier's 291.6 on the 3-layer windowed config);
            # the top tier still covers the worst boundary anywhere,
            # because deeper boundaries dedup at caps[-1].
            b1s = sorted(b for b, _ in boundary_frac)
            deep_worst = max(m for _, m in boundary_frac)
            worst = max(deep_worst, b1s[-1])
            qs = [b1s[min(len(b1s) - 1, int(q * len(b1s)))]
                  for q in (0.45, 0.75)]
            # Deep (3+-layer) configs afford a full ladder too since
            # round 5: the chain builders apply it only at the layer-1
            # boundary (deeper boundaries take the single largest cap),
            # so branch bodies grow additively instead of
            # (tiers+1)^(L-1) — the blowup that measured >40 min of XLA
            # compile for a 3-tier 3-layer DySAT config on v5e.
            #
            # Low/mid tiers carry NO headroom: overflowing one just
            # takes the next tier (cheap), while headroom inflates the
            # engaged-step cost ~linearly in the cap.  Only the TOP
            # tier keeps the 1.25x margin — its overflow is the padded
            # fallback.  (Measured, 3-layer windowed: the all-headroom
            # ladder collapsed to a single 0.84 tier at 291.6 ms/step;
            # the headroom-free (0.45, 0.7) ladder runs 200.2.)
            cands = [round(min(0.92, u + 0.02), 2) for u in qs] \
                + [round(min(0.92, 1.25 * worst + 0.03), 2)]
            tiers = []
            for f in cands[:-1]:
                # engaged savings at caps above ~0.7 measured BELOW the
                # dedup machinery cost (TGAT: an engaged 0.79 tier ran
                # 49.9 vs 48.6 ms padded) — low tiers must clear it
                if f <= 0.7 and (not tiers or f >= tiers[-1] + 0.08):
                    tiers.append(f)
            # the 1.25x-margin top tier only EXTENDS an existing ladder
            # (alone it is the same sub-benefit shape)
            if tiers and cands[-1] <= 0.85 \
                    and cands[-1] >= tiers[-1] + 0.08:
                tiers.append(cands[-1])
            if len(self.fanouts) > 2 and len(tiers) > 2:
                # deep configs: low + top only — a 3-tier 3-layer
                # program SIGKILLed the remote compile helper (program
                # size), and the measured win shape is two tiers
                # (typical-batch cap + covered worst case)
                tiers = [tiers[0], tiers[-1]]
            # deeper boundaries: fitted cap with a slim 1.1x margin
            # (their overflow pads only the remaining layers)
            new_deep = (round(min(0.85, 1.1 * deep_worst + 0.02), 2)
                        if tiers and deep_worst > 0 else None)
            if new_deep != self.layer_dedup_deep:
                self.layer_dedup_deep = new_deep
                changed = True
            new = (None if not tiers
                   else tiers[0] if len(tiers) == 1 else tuple(tiers))
            if new is not None and self.num_snapshots > 1 \
                    and self.compact_factor is not None \
                    and min(tiers) >= 0.9 * self.compact_factor:
                new = None   # block compaction is at least as tight
            if new != self.layer_dedup:
                self.layer_dedup = new
                changed = True
        if changed:
            self._rejit()
        stats["compact_factor"] = self.compact_factor
        stats["dedup_factor"] = self.dedup_factor
        stats["layer_dedup"] = self.layer_dedup
        stats["layer_dedup_deep"] = self.layer_dedup_deep
        return stats

    def _probe_batch(self, roots, ts):
        """Calibration-probe arrays for the jitted probe sampler.
        Multi-process trainers override to build process-spanning global
        arrays (every jit input must be global under ``jax.distributed``)."""
        return (jnp.asarray(roots, jnp.int32), jnp.asarray(ts, jnp.float32))

    def _host_mfgs(self, mfgs):
        """Host-readable view of probe MFGs (identity here; multi-process
        trainers all-gather the batch-sharded arrays so ``np.asarray``
        on the stats sites sees the FULL batch, not the local shard)."""
        return mfgs

    def _maybe_auto_calibrate(self, dg, roots, ts) -> None:
        """First-batch auto-calibration (no flag needed): measure the
        stream stats on the incoming batch and pick the compaction
        factors BEFORE the step jits — one compile, calibrated from the
        start.  Explicit ``calibrate()`` calls suppress it (and are
        preferable when late batches are available: window occupancy
        grows over the stream, and a first-batch cap that later
        overflows costs only the exact lax.cond fallback, never
        correctness)."""
        if self._calibrated:
            return
        import logging
        # window occupancy, boundary uniqueness and memory-instance
        # uniqueness all GROW over the stream — a first-batch cap would
        # overflow later batches into the fallback every step.
        # Re-measure the same roots with the batch's ts pattern SHIFTED
        # across the stream (the store is ingested, so each probe sees
        # that point's window fill / history length while keeping a
        # realistic timestamp multiplicity): the stream-end probe still
        # bounds the single-cap knobs at the worst case, and the
        # quantile spread feeds the layer-dedup tier ladder.
        # host-side arithmetic: eager ops on a process-spanning sharded
        # e_ts would fail under multi-controller jax.distributed, so the
        # max goes through a tiny jit (replicated scalar out)
        ts_arr = np.asarray(ts, np.float32)
        t_hi = float(jax.jit(jnp.max)(dg.e_ts))
        t_b = float(ts_arr.max())
        probes = [(roots, ts_arr + np.float32(q * t_hi - t_b))
                  for q in (0.33, 0.67, 1.0)]
        stats = self.calibrate(dg, [(roots, ts)], max_batches=1,
                               occ_batches=probes)
        logging.getLogger(__name__).info("auto-calibration: %s", stats)

    def tier_take_stats(self, state: TrainState) -> Optional[dict]:
        """Host-side view of the in-loop layer-dedup take histogram:
        per-tier step counts, the padded-fallback rate, and the active
        tier ladder.  ``None`` for configs without the dedup path."""
        if state.tier_takes is None:
            return None
        counts = np.asarray(jax.device_get(state.tier_takes))
        total = int(counts.sum())
        tiers = self._dedup_tiers()
        fb = int(counts[min(len(tiers), 3):].sum()) if tiers else 0
        return {"counts": counts.tolist(), "total": total,
                "tiers": tiers,
                "fallback_rate": (fb / total) if total else 0.0}

    def maybe_recalibrate(self, state: TrainState, dg, roots, ts, *,
                          threshold: float = 0.3,
                          min_steps: int = 20) -> TrainState:
        """In-loop calibration feedback: when the padded-fallback rate
        since the last (re)calibration exceeds ``threshold`` (bursty /
        drifting streams mis-size first-batch caps; overflow never harms
        correctness, only speed), re-run the quantile calibration around
        the CURRENT batch's timestamp pattern and reset the histogram.
        Returns the (possibly histogram-reset) state; call once per
        epoch from the training loop."""
        stats = self.tier_take_stats(state)
        if not stats or stats["total"] < min_steps \
                or not self._dedup_tiers() \
                or stats["fallback_rate"] <= threshold:
            return state
        self._calibrated = False
        self._maybe_auto_calibrate(dg, np.asarray(roots, np.int32),
                                   np.asarray(ts, np.float32))
        return state.replace(tier_takes=jnp.zeros_like(state.tier_takes))

    def _dedup_cap(self, num_all: int) -> int:
        cap = int(math.ceil(float(self.dedup_factor) * num_all / 256.0))
        return min(cap * 256, num_all)

    def _dedup_tiers(self):
        """``layer_dedup`` normalized to an ascending factor tuple."""
        ld = self.layer_dedup
        if ld is None:
            return ()
        if isinstance(ld, (tuple, list)):
            return tuple(sorted(float(f) for f in ld))
        return (float(ld),)

    @staticmethod
    def _tier_caps(factors, num_all: int):
        """Distinct ascending 256-aligned caps for a tier ladder."""
        caps = []
        for f in factors:
            c = min(num_all, -(-math.ceil(f * num_all) // 256) * 256)
            if not caps or c > caps[-1]:
                caps.append(c)
        return caps

    def _run_model(self, state, mfgs, efs, kdrop, valid, train,
                   mem_input, nfs, expansions=None):
        """Model fwd (+bwd when training) for a given memory-input/node-
        feature representation.  Returns ``(loss, pos, neg, last, grads)``
        (``grads`` None in eval)."""
        # only pass the kwarg when a compaction path produced specs
        extra = {"expansions": expansions} if expansions is not None \
            else {}

        def loss_fn(params):
            pos, neg, last = self.model.apply(
                {"params": params}, mfgs, nfs, efs, mem_input,
                train=train, rngs={"dropout": kdrop}, **extra)
            loss = link_pred_loss(pos, neg, valid, self.neg_ratio)
            return loss, (pos, neg, last)

        if train:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        else:
            loss, aux = loss_fn(state.params)
            grads = None
        pos, neg, last = aux
        return loss, pos, neg, last, grads

    def _mem_input(self, memory, mfg):
        """Memory-updater input: the raw state (per-node pre-projection
        path) or pulled per-instance rows.

        The table path computes gate projections over ALL N node rows, so
        it only pays off when the node table is small relative to the
        instance count (N << L it is ~60x redundancy at REDDIT scale; at
        GDELT scale N >> L and per-node work would dominate)."""
        if self.apan_table and not memory.packed and \
                getattr(self.model, "memory_updater", "gru") \
                == "transformer":
            # transformer updater: K/V pre-projection over the node
            # table + one slim gather (ops/apan_kv.py)
            return memory_lib.RawMemoryInput(state=memory)
        if self.gru_table and memory.mailbox_slots == 1 \
                and memory.num_nodes <= 2 * mfg.num_all:
            return memory_lib.RawMemoryInput(state=memory)
        if getattr(self.model, "compute_dtype", None) == "bfloat16" \
                and 3 * memory.num_nodes <= mfg.num_all:
            # halves the per-instance row-gather bytes; timestamps stay
            # byte-exact, values round to bf16 (which the compute casts
            # do anyway).  Gated on N: the bf16 node table is rebuilt
            # every step (one O(N) cast pass), so it only pays when the
            # table is small relative to the instance count.
            return memory_lib.prepare_input_bf16(memory, mfg)
        return memory_lib.prepare_input(memory, mfg)

    def _model_outputs(self, state, mfgs, kdrop, valid, train,
                       node_feats, edge_feats):
        """Dispatch between the deduped (compact GRU) and per-instance
        model paths.  The dedup fast path is exact — duplicates of a
        ``(nid, ts)`` pair compute identical memory rows — and a
        ``lax.cond`` falls back to the per-instance path whenever a batch
        has more unique pairs than the static capacity."""
        dn = getattr(self.model, "dim_node", 0)
        de = getattr(self.model, "dim_edge", 0)
        use_dedup = bool(self.dedup_factor) and self.model.use_memory
        if not use_dedup:
            nfs, efs = fetch_features(mfgs, node_feats, edge_feats,
                                      dn or None, de or None,
                                      edge_major=self._edge_major)
            mem_input = None
            if self.model.use_memory:
                mem_input = self._mem_input(state.memory, mfgs[0][0])
            return self._run_model(state, mfgs, efs, kdrop, valid, train,
                                   mem_input, nfs)

        from gnnflow_tpu.ops.dedup import dedup_instances
        _, efs = fetch_features(mfgs, None, edge_feats, None,
                                de or None, edge_major=self._edge_major)
        m = mfgs[0][0]
        cap = self._dedup_cap(m.num_all)
        uniq_nid, uniq_ts, inv, n_uniq, sidx, rank_sorted = \
            dedup_instances(m.all_nodes(), m.all_ts(), m.all_mask(), cap)

        def fast(_):
            di = memory_lib.DedupMemoryInput(
                state=state.memory, uniq_nids=uniq_nid, uniq_ts=uniq_ts,
                inv=inv, sidx=sidx, rank_sorted=rank_sorted,
                node_feats=node_feats, dim_node=dn)
            return self._run_model(state, mfgs, efs, kdrop, valid, train,
                                   di, [None] * len(mfgs[0]))

        def full(_):
            mem_input = self._mem_input(state.memory, m)
            nfs, _ = fetch_features(mfgs, node_feats, None,
                                    dn or None, None)
            return self._run_model(state, mfgs, efs, kdrop, valid, train,
                                   mem_input, nfs)

        return jax.lax.cond(n_uniq <= cap, fast, full, None)

    def _model_compact_outputs(self, state, dg, roots, sample_ts,
                               ksample, kdrop, valid, train,
                               node_feats, edge_feats):
        """Windowed multi-snapshot N-layer fast path: deeper layers stay
        compact through feature gathers and attention; embeddings expand
        at each layer boundary (``expand_blocks``).

        Each boundary's overflow decision (more valid neighbor blocks
        than its static cap) is computable from the PARENT layer's masks
        alone, so the per-boundary ``lax.cond`` shares all shallower
        sampling: overflow at boundary ``i`` re-samples only layers
        ``i..N-1`` padded (relative to the compact chain built so far)
        and never wastes deeper work.  The 2-layer case reduces to one
        step-level cond (round-2 behavior); N layers nest N-1 conds."""
        from gnnflow_tpu.ops.sampling import (boundary_overflow,
                                              sample_deeper_compact)
        dn = getattr(self.model, "dim_node", 0)
        de = getattr(self.model, "dim_edge", 0)
        factor = float(self.compact_factor)   # _step guards against None
        S = self.num_snapshots
        L = len(self.fanouts)
        keys = [jax.random.fold_in(ksample, i) if ksample is not None
                else None for i in range(L)]
        R = jnp.stack([roots] * S)
        T = jnp.stack([sample_ts] * S)
        # all layer sampling goes through the trainer hooks so the path
        # composes with a partitioned store (round 5): the block-packing
        # math is store-independent and packed roots route like any roots
        mfgs0 = self._sample_layer_snaps(
            dg, R, T, fanout=self.fanouts[0], shared_roots=True,
            key=keys[0])

        def run(mfgs_list, expans):
            # outermost-first chain -> the model's innermost-first order;
            # expansions[l] rides with the compact MFG it expands
            cm = list(reversed(mfgs_list))
            exps = list(reversed(expans))
            nfs, efs = fetch_features(cm, node_feats, edge_feats,
                                      dn or None, de or None,
                                      edge_major=self._edge_major)
            exps = [("blocks",) + e if e is not None else None
                    for e in exps]
            return self._run_model(
                state, cm, efs, kdrop, valid, train, None, nfs,
                expansions=exps if any(e is not None for e in exps)
                else None)

        def chain(layer, mfgs_list, expans):
            """Sample layers ``layer..L-1``; ``mfgs_list`` holds the
            outermost ``layer`` MFG lists (deepest one compact)."""
            if layer == L:
                return run(mfgs_list, expans)
            prev = mfgs_list[-1]
            Bp = prev[0].num_dst
            Fp = prev[0].fanout
            cap = min(Bp, max(1, math.ceil(factor * Bp)))
            ovf = boundary_overflow(prev, cap)

            def fast(_):
                inner, rank = sample_deeper_compact(
                    dg, prev, cap,
                    sample_fn=lambda Rc, Tc: self._sample_layer_snaps(
                        dg, Rc, Tc, fanout=self.fanouts[layer],
                        key=keys[layer]))
                return chain(layer + 1, mfgs_list + [inner],
                             expans + [(rank, cap, Fp)])

            def full(_):
                # remaining layers padded relative to the current chain
                ms, es = list(mfgs_list), list(expans)
                per = [(m.all_nodes(), m.all_ts()) for m in ms[-1]]
                for li in range(layer, L):
                    Rf = jnp.stack([r for r, _ in per])
                    Tf = jnp.stack([t for _, t in per])
                    lm = self._sample_layer_snaps(
                        dg, Rf, Tf, fanout=self.fanouts[li],
                        key=keys[li])
                    ms.append(lm)
                    es.append(None)
                    per = [(m.all_nodes(), m.all_ts()) for m in lm]
                return run(ms, es)

            return jax.lax.cond(~ovf, fast, full, None)

        return chain(1, [mfgs0], [None])

    def _layer_dedup_outputs(self, state, dg, roots, sample_ts,
                             ksample, kdrop, valid, train,
                             node_feats, edge_feats):
        """Single-snapshot multi-layer fast path (TGAT family): each
        deeper layer samples only the UNIQUE ``(nid, ts)`` instances of
        its parent layer's ``all_nodes`` (attention output is a pure
        function of the pair given the store), and the layer's output
        embeddings expand back to per-instance rows at the boundary
        (exact scatter-free transpose).  Per-boundary overflow
        (``n_uniq > cap``) falls back to the padded path for the
        remaining layers via ``lax.cond`` — results never change (up to
        dropout/uniform-RNG draw assignment, as with model_compact).

        ``layer_dedup`` may be a TIER LADDER (ascending factors, from
        calibrate()'s measured uniqueness quantiles): the sort runs once
        per boundary at the largest cap and nested conds take the
        tightest tier the batch's unique count fits — mid-stream batches
        win big, late-stream batches win small, only the true tail pays
        the padded path.  ``inv``/``sidx``/``rank_sorted`` are shared
        across tiers (rank < n_uniq <= cap on every engaged branch)."""
        from gnnflow_tpu.ops.dedup import dedup_instances
        dn = getattr(self.model, "dim_node", 0)
        de = getattr(self.model, "dim_edge", 0)
        factors = self._dedup_tiers()
        L = len(self.fanouts)
        keys = [jax.random.fold_in(ksample, i) if ksample is not None
                else None for i in range(L)]
        mfg0 = self._sample_layer(dg, roots, sample_ts,
                                  fanout=self.fanouts[0], key=keys[0])

        def run(mlist, exps):
            cm = [[m] for m in reversed(mlist)]
            ex = list(reversed(exps))
            nfs, efs = fetch_features(cm, node_feats, edge_feats,
                                      dn or None, de or None,
                                      edge_major=self._edge_major)
            return self._run_model(
                state, cm, efs, kdrop, valid, train, None, nfs,
                expansions=ex if any(e is not None for e in ex)
                else None)

        hist_box = []

        def chain(layer, mlist, exps):
            if layer == L:
                return run(mlist, exps)
            prev = mlist[-1]
            La = prev.num_all
            caps = self._tier_caps(factors, La)
            if layer > 1:
                # Deeper boundaries take ONE fitted cap, not the ladder:
                # nesting ladders grows branch bodies (tiers+1)^(L-1)
                # (>40 min of XLA compile measured), and inheriting the
                # ladder's 1.25x-headroom top tier inflates deep work
                # ~20% — layer_dedup_deep carries a slim fitted margin
                # (calibrate()), falling back to the largest tier.
                fd = self.layer_dedup_deep or factors[-1]
                caps = self._tier_caps([fd], La)
            uniq_nid, uniq_ts, inv, n_uniq, sidx, rank_sorted = \
                dedup_instances(prev.all_nodes(), prev.all_ts(),
                                prev.all_mask(), caps[-1])
            if layer == 1:
                idx = sum((n_uniq > c).astype(jnp.int32) for c in caps)
                hist_box.append((jnp.clip(idx, 0, 3) ==
                                 jnp.arange(4)).astype(jnp.int32))

            def tier(cap):
                def fast(_):
                    # unused compact slots -> invalid roots (masked rows)
                    nid_c = jnp.where(
                        jnp.arange(cap, dtype=jnp.int32) < n_uniq,
                        uniq_nid[:cap], jnp.int32(-1))
                    inner = self._sample_layer(dg, nid_c, uniq_ts[:cap],
                                               fanout=self.fanouts[layer],
                                               key=keys[layer])
                    return chain(layer + 1, mlist + [inner],
                                 exps + [("rows", inv, sidx,
                                          rank_sorted)])
                return fast

            def full(_):
                ms, es = list(mlist), list(exps)
                r, t = ms[-1].all_nodes(), ms[-1].all_ts()
                for li in range(layer, L):
                    lm = self._sample_layer(dg, r, t,
                                            fanout=self.fanouts[li],
                                            key=keys[li])
                    ms.append(lm)
                    es.append(None)
                    r, t = lm.all_nodes(), lm.all_ts()
                return run(ms, es)

            out = full
            for cap in reversed(caps):
                out = (lambda f, nxt, c: lambda op:
                       jax.lax.cond(n_uniq <= c, f, nxt, op))(
                    tier(cap), out, cap)
            return out(None)

        return chain(1, [mfg0], [None]), hist_box[0]

    def _snapshot_dedup_outputs(self, state, dg, roots, sample_ts,
                                ksample, kdrop, valid, train,
                                node_feats, edge_feats):
        """Windowed multi-snapshot (nid, ts)-dedup fast path (DySAT
        family): each snapshot's deeper layer samples only the UNIQUE
        ``(nid, ts)`` instances of that snapshot's parent ``all_nodes``
        (the snapshot window is a pure function of the pair and the
        snapshot index, so duplicates sample identically), and the
        layer's output embeddings expand back per snapshot at the
        boundary.  Strictly tighter than the occupancy-based block
        compaction (:meth:`_model_compact_outputs`): dedup drops invalid
        rows AND duplicate pairs — measured ~31% unique vs ~60% valid at
        the DySAT w=10000 headline.  Any snapshot overflowing its cap
        falls back to the padded path for the remaining layers
        (``lax.cond``); results never change (up to dropout/uniform-RNG
        draw assignment).  Reference semantics:
        ``gnnflow/config.py:61-76`` (DySAT),
        ``temporal_sampler.cu`` snapshot windows."""
        from gnnflow_tpu.ops.dedup import dedup_instances
        dn = getattr(self.model, "dim_node", 0)
        de = getattr(self.model, "dim_edge", 0)
        factors = self._dedup_tiers()
        S = self.num_snapshots
        L = len(self.fanouts)
        keys = [jax.random.fold_in(ksample, i) if ksample is not None
                else None for i in range(L)]
        R = jnp.stack([roots] * S)
        T = jnp.stack([sample_ts] * S)
        mfgs0 = self._sample_layer_snaps(
            dg, R, T, fanout=self.fanouts[0], shared_roots=True,
            key=keys[0])

        def run(mfgs_list, expans):
            cm = list(reversed(mfgs_list))
            exps = list(reversed(expans))
            nfs, efs = fetch_features(cm, node_feats, edge_feats,
                                      dn or None, de or None,
                                      edge_major=self._edge_major)
            return self._run_model(
                state, cm, efs, kdrop, valid, train, None, nfs,
                expansions=exps if any(e is not None for e in exps)
                else None)

        hist_box = []

        def chain(layer, mfgs_list, expans):
            if layer == L:
                return run(mfgs_list, expans)
            prev = mfgs_list[-1]                       # S MFGs
            La = prev[0].num_all
            caps = self._tier_caps(factors, La)
            if layer > 1:
                # one fitted deep cap; see _layer_dedup_outputs
                fd = self.layer_dedup_deep or factors[-1]
                caps = self._tier_caps([fd], La)
            dd = [dedup_instances(m.all_nodes(), m.all_ts(),
                                  m.all_mask(), caps[-1]) for m in prev]
            n_max = dd[0][3]
            for d in dd[1:]:
                n_max = jnp.maximum(n_max, d[3])
            if layer == 1:
                idx = sum((n_max > c).astype(jnp.int32) for c in caps)
                hist_box.append((jnp.clip(idx, 0, 3) ==
                                 jnp.arange(4)).astype(jnp.int32))

            def tier(cap):
                def fast(_):
                    slot = jnp.arange(cap, dtype=jnp.int32)
                    # unused compact slots -> invalid roots (masked)
                    Rn = jnp.stack([jnp.where(slot < d[3], d[0][:cap],
                                              jnp.int32(-1))
                                    for d in dd])
                    Tn = jnp.stack([d[1][:cap] for d in dd])
                    inner = self._sample_layer_snaps(
                        dg, Rn, Tn, fanout=self.fanouts[layer],
                        key=keys[layer])
                    spec = ("rows",
                            jnp.stack([d[2] for d in dd]),  # inv [S, La]
                            jnp.stack([d[4] for d in dd]),  # sidx
                            jnp.stack([d[5] for d in dd]))  # rank_sorted
                    return chain(layer + 1, mfgs_list + [inner],
                                 expans + [spec])
                return fast

            def full(_):
                ms, es = list(mfgs_list), list(expans)
                per = [(m.all_nodes(), m.all_ts()) for m in ms[-1]]
                for li in range(layer, L):
                    Rf = jnp.stack([r for r, _ in per])
                    Tf = jnp.stack([t for _, t in per])
                    lm = self._sample_layer_snaps(
                        dg, Rf, Tf, fanout=self.fanouts[li],
                        key=keys[li])
                    ms.append(lm)
                    es.append(None)
                    per = [(m.all_nodes(), m.all_ts()) for m in lm]
                return run(ms, es)

            out = full
            for cap in reversed(caps):
                out = (lambda f, nxt, c: lambda op:
                       jax.lax.cond(n_max <= c, f, nxt, op))(
                    tier(cap), out, cap)
            return out(None)

        return chain(1, [mfgs0], [None]), hist_box[0]

    def _step(self, state: TrainState, dg: DeviceGraph,
              node_feats, edge_feats,
              target_nodes, ts, eids, valid, train: bool):
        """One fused iteration.  ``target_nodes``/``ts`` are [3B] (src|dst|
        neg blocks), ``eids`` [B], ``valid`` [B] masks padded rows."""
        key, kdrop, ksample = jax.random.split(state.key, 3)
        sample_ts = (jnp.full_like(ts, np.float32(3.4e38))
                     if self.is_static else ts)
        roots32 = target_nodes.astype(jnp.int32)
        # model_compact needs a concrete factor: calibrate() sets
        # compact_factor=None at high occupancy to DISABLE compaction —
        # honoring that here keeps the padded path single-branch instead
        # of compiling a compact branch that overflows every step.
        tier_hist = None
        if self.layer_dedup is not None and self.num_snapshots > 1 \
                and "snapshot_dedup" in self._fast_paths:
            # per-snapshot (nid, ts) dedup: strictly tighter than the
            # occupancy block compaction below (calibrate() picks it
            # only when its capacity beats the occupancy factor)
            (loss, pos, neg, last, grads), tier_hist = \
                self._snapshot_dedup_outputs(
                    state, dg, roots32, sample_ts, ksample, kdrop, valid,
                    train, node_feats, edge_feats)
        elif self.model_compact and self.compact_factor is not None \
                and "model_compact" in self._fast_paths:
            loss, pos, neg, last, grads = self._model_compact_outputs(
                state, dg, roots32, sample_ts, ksample, kdrop, valid,
                train, node_feats, edge_feats)
        elif self.layer_dedup is not None \
                and "layer_dedup" in self._fast_paths:
            (loss, pos, neg, last, grads), tier_hist = \
                self._layer_dedup_outputs(
                    state, dg, roots32, sample_ts, ksample, kdrop, valid,
                    train, node_feats, edge_feats)
        else:
            mfgs = self._sample(dg, roots32, sample_ts, ksample)
            loss, pos, neg, last, grads = self._model_outputs(
                state, mfgs, kdrop, valid, train, node_feats,
                edge_feats)

        if train:
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        else:
            params, opt_state = state.params, state.opt_state

        memory = state.memory
        if self.model.use_memory:
            # target-edge features for mails (cache.py:402-411)
            tef = _gather_rows(edge_feats, eids.astype(jnp.int32), valid,
                               self.model.dim_edge or None) \
                if edge_feats is not None else None
            memory = memory_lib.update_mem_mail(
                memory, last["last_updated_nid"],
                last["last_updated_memory"], last["last_updated_ts"],
                edge_feats=tef, valid=valid,
                neg_sample_ratio=self.neg_ratio)
        takes = state.tier_takes
        if takes is not None and tier_hist is not None and train:
            takes = takes + tier_hist
        new_state = state.replace(params=params, opt_state=opt_state,
                                  memory=memory, key=key,
                                  step=state.step + 1,
                                  tier_takes=takes)
        return new_state, loss, pos[:, 0], neg[:, 0]

    def _step_prefetched(self, state: TrainState, mfgs, nfs, efs, tef,
                         eids, valid, train: bool):
        """Model/optimizer/memory step over pre-sampled MFGs with
        pre-fetched (cache-supplied) features — the large-feature-table
        path where sampling + cache fetch happen outside jit."""
        key, kdrop = jax.random.split(state.key)
        use_dedup = (bool(self.dedup_factor) and self.model.use_memory
                     and getattr(self.model, "dim_node", 0) == 0)
        if use_dedup:
            # node features arrive pre-gathered per instance here, so the
            # compact path only applies to node-feature-free models
            from gnnflow_tpu.ops.dedup import dedup_instances
            m = mfgs[0][0]
            cap = self._dedup_cap(m.num_all)
            uniq_nid, uniq_ts, inv, n_uniq, sidx, rank_sorted = \
                dedup_instances(m.all_nodes(), m.all_ts(), m.all_mask(),
                                cap)

            def fast(_):
                di = memory_lib.DedupMemoryInput(
                    state=state.memory, uniq_nids=uniq_nid,
                    uniq_ts=uniq_ts, inv=inv, sidx=sidx,
                    rank_sorted=rank_sorted)
                return self._run_model(state, mfgs, efs, kdrop, valid,
                                       train, di, nfs)

            def full(_):
                mem_input = self._mem_input(state.memory, m)
                return self._run_model(state, mfgs, efs, kdrop, valid,
                                       train, mem_input, nfs)

            loss, pos, neg, last, grads = jax.lax.cond(
                n_uniq <= cap, fast, full, None)
        else:
            mem_input = None
            if self.model.use_memory:
                mem_input = self._mem_input(state.memory, mfgs[0][0])
            loss, pos, neg, last, grads = self._run_model(
                state, mfgs, efs, kdrop, valid, train, mem_input, nfs)

        if train:
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        else:
            params, opt_state = state.params, state.opt_state

        memory = state.memory
        if self.model.use_memory:
            memory = memory_lib.update_mem_mail(
                memory, last["last_updated_nid"],
                last["last_updated_memory"], last["last_updated_ts"],
                edge_feats=tef, valid=valid,
                neg_sample_ratio=self.neg_ratio)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  memory=memory, key=key,
                                  step=state.step + 1)
        return new_state, loss, pos[:, 0], neg[:, 0]

    # ------------------------------------------------------------------

    def train_step_prefetched(self, state, mfgs, nfs, efs, tef, batch,
                              train=True):
        # MFGs may live on the CPU backend (host-placement stores); move
        # them to the default (accelerator) device for the fused step.
        # Never touch sharded (multi-device) MFGs.
        devs = mfgs[0][0].root_nids.devices()
        dev = jax.devices()[0]
        if len(devs) == 1 and next(iter(devs)) != dev:
            mfgs = jax.device_put(mfgs, dev)
        return self._pre_step(
            state, mfgs, nfs, efs, tef,
            jnp.asarray(batch.eids, jnp.int32), _valid_mask(batch), train)

    def train_step_arrays(self, state, dg, node_feats, edge_feats,
                          target_nodes, ts, eids, valid, train=True):
        """Direct array-based step (no per-call host conversion) — use
        with pre-staged device batches for maximum throughput."""
        if train:
            self._maybe_auto_calibrate(dg, target_nodes, ts)
        return self._train_step(state, dg, node_feats, edge_feats,
                                target_nodes, ts, eids, valid, train)

    def train_steps_scan(self, state, dg, node_feats, edge_feats,
                         target_nodes, ts, eids, valid):
        """Run a whole sequence of training steps in ONE dispatch via
        ``lax.scan`` (batch arrays carry a leading step axis).  This is
        the TPU answer to the reference's sampling/training software
        pipeline: zero per-step host involvement.

        Returns ``(state, losses[K])``."""
        self._maybe_auto_calibrate(dg, target_nodes[0], ts[0])
        if not hasattr(self, "_scan_step"):
            def run(state, dg, nf, ef, tn, ts, eids, valid):
                def body(carry, xs):
                    new_state, loss, _, _ = self._step(
                        carry, dg, nf, ef, *xs, True)
                    return new_state, loss
                return jax.lax.scan(body, state, (tn, ts, eids, valid))

            self._scan_step = jax.jit(run, donate_argnums=(0,))
        return self._scan_step(state, dg, node_feats, edge_feats,
                               target_nodes, ts, eids, valid)

    def train_step(self, state, dg, node_feats, edge_feats, batch):
        self._maybe_auto_calibrate(dg, batch.target_nodes, batch.ts)
        return self._train_step(
            state, dg, node_feats, edge_feats,
            jnp.asarray(batch.target_nodes, jnp.int32),
            jnp.asarray(batch.ts, jnp.float32),
            jnp.asarray(batch.eids, jnp.int32),
            _valid_mask(batch), True)

    def embed_step(self, state, dg, node_feats, edge_feats, batch):
        """Compute target-node embeddings (``model(..., return_embed)``)
        for a batch — the reference's per-window embedding dump for t-SNE
        (``scripts/inference.py:173-232``).  Read-only: memory is not
        written back.  Returns ``[(2+r)·B, dim_embed]``."""
        if not hasattr(self, "_embed_fn"):
            def run(state, dg, nf, ef, target_nodes, ts):
                key, kdrop, ksample = jax.random.split(state.key, 3)
                sample_ts = (jnp.full_like(ts, np.float32(3.4e38))
                             if self.is_static else ts)
                mfgs = self._sample(dg, target_nodes.astype(jnp.int32),
                                    sample_ts, ksample)
                nfs, efs = fetch_features(
                    mfgs, nf, ef,
                    getattr(self.model, "dim_node", 0) or None,
                    getattr(self.model, "dim_edge", 0) or None,
                    edge_major=self._edge_major)
                mem_input = None
                if self.model.use_memory:
                    mem_input = self._mem_input(state.memory, mfgs[0][0])
                embed, _ = self.model.apply(
                    {"params": state.params}, mfgs, nfs, efs, mem_input,
                    train=False, return_embed=True,
                    rngs={"dropout": kdrop})
                return embed
            self._embed_fn = jax.jit(run)
        return self._embed_fn(
            state, dg, node_feats, edge_feats,
            jnp.asarray(batch.target_nodes, jnp.int32),
            jnp.asarray(batch.ts, jnp.float32))

    def eval_step(self, state, dg, node_feats, edge_feats, batch):
        return self._train_step(
            state, dg, node_feats, edge_feats,
            jnp.asarray(batch.target_nodes, jnp.int32),
            jnp.asarray(batch.ts, jnp.float32),
            jnp.asarray(batch.eids, jnp.int32),
            _valid_mask(batch), False)


def _valid_mask(batch) -> jax.Array:
    m = np.zeros(batch.batch_size, dtype=bool)
    m[: batch.num_valid] = True
    return jnp.asarray(m)
