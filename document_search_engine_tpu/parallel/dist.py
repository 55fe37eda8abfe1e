"""Document-sharded index + SPMD search (BASELINE.json:5).

Each shard owns a contiguous global doc-id range and holds its own CSR
segment (own vocabulary) padded to fleet-uniform shapes. One search step
under `shard_map`: local fixed-point scoring -> local ranked top-k ->
`all_gather` of (score, gid) candidates over the `docs` axis (ICI) ->
replicated k-way merge, "so multi-chip corpora return one global ranked
list". Scores are integer fixed-point (DESIGN.md §2), so rankings are
bit-identical for every shard count — tested 1 vs N.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import IndexConfig
from ..engine.query import QueryFrontend, segment_rows
from ..index import builder
from ..index.csr import GlobalStats, merge_stats, round_up
from ..ops.schedule import blocks_per_query, bucket_queries
from ..ops.topk import merge_candidates
from ..oracle import spec
from .mesh import DOCS_AXIS, make_mesh

F32 = np.float32


@dataclass
class ShardedIndex:
    """Stacked per-shard aligned posting planes; axis 0 is the `docs`
    mesh axis (see index/csr.py SegmentDevice for the plane layout)."""

    post_doc: jnp.ndarray  # (n_shards, X, 128) i32
    post_val: jnp.ndarray  # (n_shards, X, 128) i32 bitcast f32
    # raw tfs in the same geometry: lets incremental updates
    # re-materialize vals ON DEVICE (O(docs) H2D, not O(nnz))
    post_tf: jnp.ndarray  # (n_shards, X, 128) i32
    alive: jnp.ndarray  # (n_shards, D_pad) bool
    doc_base: jnp.ndarray  # (n_shards, 1) i32
    hosts: list  # per-shard SegmentHost (numpy metadata)
    stats: GlobalStats
    n_shards: int
    d_pad: int
    t_pad: int  # uniform padded vocab size (sizes incremental updates)


def _ensure_host_csr(h) -> None:
    """Device-built segments keep no host postings copies; re-derive
    them from the analyzed docs when a host-side reassembly needs them
    (same lexsort as the original pack — bit-identical)."""
    if h.post_doc is not None:
        return
    a = builder.AnalyzedDocs(
        hashes=h.doc_hashes, tfs=h.doc_tfs, doc_ptr=h.doc_ptr, dl=h.dl
    )
    nh = builder.build_host_segment(a, h.doc_base)
    h.indptr = nh.indptr
    h.post_doc = nh.post_doc
    h.post_tf = nh.post_tf


def assemble_sharded(hosts, config: IndexConfig, mesh: Mesh) -> ShardedIndex:
    """Pack per-shard host metadata into fleet-uniform padded device
    arrays with corpus-global stats; used by build and incremental
    updates (the device arrays are fully derivable from SegmentHost)."""
    for h in hosts:
        _ensure_host_csr(h)
    n_shards = len(hosts)
    stats = merge_stats(hosts)
    # ~25% vocab and ~12.5% postings growth headroom so small incremental
    # adds fit the padded shapes and take the O(delta) last-shard update
    # instead of a full reassembly (_update_last_shard)
    t_max = max(h.n_terms for h in hosts)
    t_pad = round_up(t_max + max(t_max // 4, 64), 64)
    d_pad = round_up(max(h.n_docs for h in hosts) + 1, config.docs_pad_to)
    geoms = [
        builder.aligned_geometry(h.indptr, config.nnz_pad_to)
        for h in hosts
    ]
    x_rows = max(x for _, x in geoms)
    x_rows = x_rows + max(x_rows // 8, 8)

    pd = np.zeros((n_shards, x_rows, 128), np.int32)
    pv = np.zeros((n_shards, x_rows, 128), np.int32)
    pt = np.zeros((n_shards, x_rows, 128), np.int32)
    al = np.zeros((n_shards, d_pad), bool)
    for i, (h, (row_start, xr)) in enumerate(zip(hosts, geoms)):
        h.row_start = row_start
        vals, _inv_norm = builder.segment_vals(h, config, stats)
        d2, v2, t2 = builder._host_planes(
            h.post_doc, vals, h.post_tf, h.indptr, row_start, x_rows,
            h.n_docs,
        )
        pd[i] = d2
        pv[i] = v2
        pt[i] = t2
        al[i, : h.n_docs] = h.alive

    shard0 = NamedSharding(mesh, P(DOCS_AXIS))
    return ShardedIndex(
        post_doc=jax.device_put(pd, shard0),
        post_val=jax.device_put(pv, shard0),
        post_tf=jax.device_put(pt, shard0),
        alive=jax.device_put(al, shard0),
        doc_base=jax.device_put(
            np.array(
                [h.doc_base for h in hosts], np.int32
            ).reshape(n_shards, 1),
            shard0,
        ),
        hosts=hosts,
        stats=stats,
        n_shards=n_shards,
        d_pad=d_pad,
        t_pad=t_pad,
    )


@partial(jax.jit, static_argnames=("kind",))
def _sharded_materialize_vals(
    post_doc,  # (n_shards, X, 128) i32
    post_tf,  # (n_shards, X, 128) i32
    k_doc,  # (n_shards, d_pad) f32
    inv_norm,  # (n_shards, d_pad) f32
    alive,  # (n_shards, d_pad) bool
    k1p1,  # f32 scalar
    kind: str,
):
    """Stacked-shard version of builder.device_materialize_vals: the
    sharding (docs axis 0) is preserved, so the O(nnz) planes never
    leave their shards; only the (n_shards, d_pad) inputs were shipped.
    Same bit-exact formula and the same host-computed K(dl) (see
    builder.device_materialize_vals for the FMA-contraction rationale).
    """

    def one(pd, pt, kd, inv, al):
        tff = pt.astype(jnp.float32)
        if kind == "tfidf":
            val = tff * inv[pd]
        else:
            val = builder.exact_div(tff * k1p1, tff + kd[pd])
        # explicit select (not `val * alive`): padding exact_div(0,0)
        # is NaN; stored padding must be +0.0 bits (ADVICE.md round 2)
        val = jnp.where(al[pd], val, jnp.float32(0.0))
        return jax.lax.bitcast_convert_type(val, jnp.int32)

    return jax.vmap(one)(post_doc, post_tf, k_doc, inv_norm, alive)


def build_sharded(
    texts, config: IndexConfig, mesh: Mesh, device_build: bool = True
) -> ShardedIndex:
    """Build a document-sharded index: contiguous doc ranges per shard,
    corpus-global df/idf (host merge; `psum` in the SPMD build demo),
    fleet-uniform padded shapes.

    device_build (default): each shard's CSR pack + materialization is a
    jit device job (builder.build_segment_device) — the BASELINE.json:5
    "index build is itself a jit-compiled batch job"; the padded stacked
    planes assemble on device. The host build remains as the
    tested-equal fallback."""
    texts = list(texts)
    n_shards = mesh.devices.size
    n_docs = len(texts)
    per = -(-n_docs // n_shards) if n_docs else 1
    if device_build:
        segs = []
        for i in range(n_shards):
            lo, hi = min(i * per, n_docs), min((i + 1) * per, n_docs)
            a = builder.analyze_texts_fast(texts[lo:hi], config)
            segs.append(
                builder.build_segment_device(a, config, doc_base=lo)
            )
        return assemble_sharded_device(segs, config, mesh)
    hosts = []
    for i in range(n_shards):
        lo, hi = min(i * per, n_docs), min((i + 1) * per, n_docs)
        a = builder.analyze_texts_fast(texts[lo:hi], config)
        hosts.append(builder.build_host_segment(a, lo))
    return assemble_sharded(hosts, config, mesh)


def assemble_sharded_device(segs, config: IndexConfig, mesh: Mesh):
    """Stack per-shard DEVICE-BUILT segments into the fleet-uniform
    sharded index: planes are padded and stacked on device (the O(nnz)
    postings never round-trip to host), then values refresh for the
    corpus-global stats."""
    hosts = [h for h, _ in segs]
    n_shards = len(hosts)
    t_max = max(h.n_terms for h in hosts)
    t_pad = round_up(t_max + max(t_max // 4, 64), 64)
    d_pad = round_up(max(h.n_docs for h in hosts) + 1, config.docs_pad_to)
    x_rows = max(int(d.post_doc.shape[0]) for _, d in segs)
    x_rows = x_rows + max(x_rows // 8, 8)

    def pad_planes(h, d):
        xr = int(d.post_doc.shape[0])
        pad = ((0, x_rows - xr), (0, 0))
        pd = jnp.pad(d.post_doc, pad, constant_values=h.n_docs)
        pt = jnp.pad(d.post_tf, pad)
        return pd, pt

    parts = [pad_planes(h, d) for h, d in segs]
    shard0 = NamedSharding(mesh, P(DOCS_AXIS))
    idx = ShardedIndex(
        post_doc=jax.device_put(jnp.stack([p[0] for p in parts]), shard0),
        post_val=None,  # refreshed below (needs corpus-global stats)
        post_tf=jax.device_put(jnp.stack([p[1] for p in parts]), shard0),
        alive=None,
        doc_base=jax.device_put(
            np.array(
                [h.doc_base for h in hosts], np.int32
            ).reshape(n_shards, 1),
            shard0,
        ),
        hosts=hosts,
        stats=merge_stats(hosts),
        n_shards=n_shards,
        d_pad=d_pad,
        t_pad=t_pad,
    )

    refresh_sharded_vals(idx, config, mesh)
    return idx


def refresh_sharded_vals(idx: ShardedIndex, config: IndexConfig, mesh: Mesh):
    """Device-side val re-materialization for every shard after
    df/N/avgdl change: ships only (n_shards, d_pad) k_doc/inv_norm/alive
    — O(docs) H2D, the O(nnz) planes stay resident."""
    idx.stats = merge_stats(idx.hosts)
    n_shards, d_pad = idx.n_shards, idx.d_pad
    kd = np.zeros((n_shards, d_pad), F32)
    inv = np.zeros((n_shards, d_pad), F32)
    al = np.zeros((n_shards, d_pad), bool)
    for i, h in enumerate(idx.hosts):
        k_doc, inv_norm, alive = builder.refresh_inputs(
            h, config, idx.stats
        )
        kd[i, : h.n_docs] = k_doc
        inv[i, : h.n_docs] = inv_norm
        al[i, : h.n_docs] = alive
    shard0 = NamedSharding(mesh, P(DOCS_AXIS))
    idx.alive = jax.device_put(al, shard0)
    idx.post_val = _sharded_materialize_vals(
        idx.post_doc,
        idx.post_tf,
        jax.device_put(kd, shard0),
        jax.device_put(inv, shard0),
        idx.alive,
        jnp.float32(F32(config.scoring.k1 + 1.0)),
        kind=config.scoring.kind,
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "plan", "d_pad", "scale", "clip", "mode", "interpret",
        "mesh_",
    ),
)
def _sharded_batch_step(
    post_doc,  # (n_shards, X, 128) i32 aligned doc planes
    post_val,  # (n_shards, X, 128) i32 aligned bitcast-f32 val planes
    doc_base,  # (n_shards, 1) i32
    srcrows,  # tuple of per-bucket (n_shards, bq, 1, NB) i32 plan tables
    rems,  # tuple of per-bucket (n_shards, bq, 1, NB) i32
    abits,  # tuple of per-bucket (n_shards, bq, 1, NB) i32
    k: int,
    plan,  # static: (s, ((n_blocks, block), ...)) bucket layout
    d_pad: int,
    scale: float,
    clip: float,
    mode: str,  # "fused" | "xla" | "xla_rank"
    interpret: bool,
    mesh_: Mesh,
):
    """One SPMD dispatch for a whole query batch: every bucket's scorer
    (fused Pallas kernel on TPU meshes, its bit-identical XLA twin
    elsewhere) runs inside the same program per shard, candidates are
    concatenated, and a single `all_gather` over ICI + replicated merge
    produce the global top-k."""
    from ..ops.fused_pallas import fused_search_pallas
    from ..ops.packed import search_packed_tables

    s, buckets = plan

    def local(pd, pv, base, srs, rms, abs_):
        pd, pv = pd[0], pv[0]
        parts_v, parts_g = [], []
        for bi, (n_blocks, block) in enumerate(buckets):
            sr, rm, ab = srs[bi][0], rms[bi][0], abs_[bi][0]
            # d_pad-1 is a safe uniform local sentinel: every shard's
            # real local ids are <= d_pad-2 (d_pad >= max local docs + 1)
            if mode == "fused" and k <= 128:
                v, dloc = fused_search_pallas(
                    pd, pv, sr, rm, ab,
                    n_blocks=n_blocks, block=block, s=s, k=k,
                    n_docs=d_pad - 1, scale=scale, clip=clip,
                    interpret=interpret,
                )
                g = jnp.where(v > 0, dloc + base[0, 0], -1)
            else:
                v, g = search_packed_tables(
                    pd, pv, sr, rm, ab,
                    jnp.float32(scale), jnp.float32(clip), base[0, 0],
                    n_blocks=n_blocks, block=block, s=s, k=k,
                    n_docs=d_pad - 1,
                    use_rank_pallas=(mode == "xla_rank" and k <= 128),
                    rank_interpret=interpret,
                )
            parts_v.append(v)
            parts_g.append(g)
        vals = jnp.concatenate(parts_v, axis=0)  # (B_total, k)
        gids = jnp.concatenate(parts_g, axis=0)
        # ICI boundary: one gather of every shard's candidates per batch.
        vals_g = jax.lax.all_gather(vals, DOCS_AXIS)  # (S, B_total, k)
        gids_g = jax.lax.all_gather(gids, DOCS_AXIS)
        nq = vals.shape[0]
        vals_c = jnp.swapaxes(vals_g, 0, 1).reshape(nq, -1)
        gids_c = jnp.swapaxes(gids_g, 0, 1).reshape(nq, -1)
        mv, mg = merge_candidates(vals_c, gids_c, k=k)
        # Every shard computed the identical merge of the all-gathered
        # candidates; emit them stacked over the axis (sliced to one
        # replica by the caller) — keeps the vma replication check on.
        return mv[None], mg[None]

    sh = P(DOCS_AXIS)
    vals_all, gids_all = shard_map(
        local,
        mesh=mesh_,
        in_specs=(sh, sh, sh, sh, sh, sh),
        out_specs=(sh, sh),
        # pallas_call outputs carry no vma annotation, which the vma
        # check rejects; replication is still guaranteed by the
        # all-gather + identical merge (pinned by the shard-count
        # invariance tests)
        check_vma=False,
    )(post_doc, post_val, doc_base, srcrows, rems, abits)
    # (n_shards, nq, k) of identical replicas -> one copy.
    return vals_all[0], gids_all[0]


class DistributedSearchEngine:
    """Multi-chip search engine over a `docs` mesh (same results as the
    single-process SearchEngine, bit-for-bit — tested)."""

    def __init__(self, config: IndexConfig | None = None, mesh: Mesh | None = None):
        self.config = config or IndexConfig()
        self.mesh = mesh or make_mesh()
        self.frontend = QueryFrontend(self.config)
        self.index: ShardedIndex | None = None
        # None = auto ("fused" Pallas kernel on TPU meshes, "xla"
        # elsewhere); "xla_rank" = XLA pack + Pallas rank kernel
        self.scorer: str | None = None
        # jit device-side per-shard CSR pack + materialization (the
        # BASELINE.json:5 "index build is itself a jit-compiled batch
        # job"); host build kept as the tested-equal fallback
        self.device_build: bool = True

    def build(self, texts) -> None:
        self.index = build_sharded(
            texts, self.config, self.mesh, device_build=self.device_build
        )

    @property
    def n_docs_total(self) -> int:
        if self.index is None:
            return 0
        return max(
            h.doc_base + h.n_docs for h in self.index.hosts
        )

    def add_docs(self, texts) -> list:
        """Incremental add: new docs join the last shard (its global-id
        range stays contiguous); global stats and idf-dependent values
        refresh exactly (same semantics as SearchEngine.add_docs —
        tested bit-identical). Rebalancing across shards is a compact-
        style rebuild (`build`)."""
        texts = list(texts)
        if not texts:
            return []
        if self.index is None:
            self.build(texts)
            return list(range(len(texts)))
        hosts = self.index.hosts
        last = hosts[-1]
        base0 = self.n_docs_total
        a_new = builder.analyze_texts_fast(texts, self.config)
        merged = builder.AnalyzedDocs(
            hashes=np.concatenate([last.doc_hashes, a_new.hashes]),
            tfs=np.concatenate([last.doc_tfs, a_new.tfs]),
            doc_ptr=np.concatenate(
                [last.doc_ptr, last.doc_ptr[-1] + a_new.doc_ptr[1:]]
            ),
            dl=np.concatenate([last.dl, a_new.dl]),
        )
        new_last = builder.build_host_segment(merged, last.doc_base)
        new_last.alive[: last.n_docs] = last.alive
        # df must count alive docs only — the rebuilt shard counted all
        builder.recompute_alive_df(new_last)
        new_hosts = hosts[:-1] + [new_last]
        if not self._update_last_shard(new_last):
            # grew past the fleet-uniform padded shapes: full reassemble
            self.index = assemble_sharded(new_hosts, self.config, self.mesh)
        else:
            self.index.hosts = new_hosts
            self._refresh_sharded_vals()
        return list(range(base0, base0 + a_new.n_docs))

    def _update_last_shard(self, new_last) -> bool:
        """O(shard) in-place device update for an add that fits the
        existing padded shapes: ship ONE shard's new planes/indptr and
        dynamic-update the stacked arrays; every other shard's postings
        stay resident (their idf-dependent vals refresh separately).
        Returns False when the shard outgrew the allocation."""
        idx = self.index
        t_pad = idx.t_pad
        x_rows = idx.post_doc.shape[1]
        row_start, xr = builder.aligned_geometry(
            new_last.indptr, self.config.nnz_pad_to
        )
        if (
            new_last.n_terms > t_pad
            or xr > x_rows
            or new_last.n_docs + 1 > idx.d_pad
        ):
            return False
        new_last.row_start = row_start
        d2, _v2, t2 = builder._host_planes(
            new_last.post_doc,
            np.zeros(0, np.float32),  # vals follow from the refresh
            new_last.post_tf,
            new_last.indptr,
            row_start,
            x_rows,
            new_last.n_docs,
        )
        i = idx.n_shards - 1
        idx.post_doc = idx.post_doc.at[i].set(d2)
        idx.post_tf = idx.post_tf.at[i].set(t2)
        return True

    def _refresh_sharded_vals(self) -> None:
        refresh_sharded_vals(self.index, self.config, self.mesh)

    def delete_docs(self, global_ids) -> None:
        """Tombstone docs across shards with exact df/N/avgdl updates."""
        if self.index is None:
            return
        hosts = self.index.hosts
        changed = False
        for g in global_ids:
            for h in hosts:
                if h.doc_base <= g < h.doc_base + h.n_docs:
                    ld = g - h.doc_base
                    if h.alive[ld]:
                        h.alive[ld] = False
                        s, e = h.doc_ptr[ld], h.doc_ptr[ld + 1]
                        rows = np.searchsorted(
                            h.term_hash, h.doc_hashes[s:e]
                        )
                        h.df[rows] -= 1
                        changed = True
                    break
        if changed:
            # O(delta): postings stay resident; only per-doc arrays ship
            self._refresh_sharded_vals()

    def save(self, path: str) -> None:
        from ..index.checkpoint import save_sharded

        save_sharded(self, path)

    @classmethod
    def load(cls, path: str, mesh: Mesh | None = None):
        from ..index.checkpoint import load_sharded

        return load_sharded(path, mesh=mesh)

    @property
    def scorer_mode(self) -> str:
        """Active scorer inside the SPMD step: "fused" (Pallas
        DMA+score+rank kernel, TPU-mesh default), "xla", or "xla_rank".
        All modes bit-identical (tested)."""
        if self.scorer is not None:
            return self.scorer
        return (
            "fused"
            if self.mesh.devices.flat[0].platform == "tpu"
            else "xla"
        )

    def search(self, queries, k: int = 10):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        nq = len(queries)
        if self.index is None or nq == 0:
            return (
                np.full((nq, k), -1, np.int64),
                np.full((nq, k), -1, np.int64),
            )
        fut = self._dispatch(queries, k)
        return self._collect(fut)

    def search_stream(self, query_batches, k: int = 10, depth: int = 2):
        """Pipelined sharded serving loop (same contract as
        SearchEngine.search_stream): one SPMD dispatch per batch, up to
        `depth` batches in flight."""
        from collections import deque
        from functools import partial as _partial

        inflight: deque = deque()
        for queries in query_batches:
            nq = len(queries)
            if self.index is None or nq == 0:
                empty = (
                    np.full((nq, k), -1, np.int64),
                    np.full((nq, k), -1, np.int64),
                )
                inflight.append(lambda e=empty: e)
            else:
                fut = self._dispatch(queries, k)
                inflight.append(_partial(self._collect, fut))
            if len(inflight) >= depth:
                yield inflight.popleft()()
        while inflight:
            yield inflight.popleft()()

    def _dispatch(self, queries, k: int):
        """Host planning + ONE fused SPMD dispatch for a query batch:
        per-bucket DMA plan tables staged per shard (one sharded
        device_put each), all buckets + the all-gather merge in one XLA
        program."""
        from ..ops.fused_pallas import plan_tables

        idx = self.index
        nq = len(queries)
        slot_h, coeff = self.frontend.analyze(queries, idx.stats)
        from ..engine.engine import slice_active_slots

        slot_h, coeff = slice_active_slots(slot_h, coeff)
        n_shards = idx.n_shards
        s = slot_h.shape[1]
        rows = np.zeros((n_shards, nq, s), np.int32)
        coeffs = np.zeros((n_shards, nq, s), F32)
        # per-query block budget = max over shards (uniform SPMD shapes)
        block = 512
        nblk_q = np.zeros(nq, np.int64)
        for i, h in enumerate(idx.hosts):
            r, found = segment_rows(h.term_hash, slot_h)
            rows[i] = r
            coeffs[i] = np.where(found, coeff, F32(0.0))
            nblk_q = np.maximum(
                nblk_q, blocks_per_query(h.indptr, r, found, block)
            )
        sc = self.config.scoring
        scale = float(F32(2.0**sc.scale_bits))
        clip = float(
            F32(int(spec.quant_clip_max(self.config.max_query_terms)))
        )
        shard0 = NamedSharding(self.mesh, P(DOCS_AXIS))
        buckets = []
        srcrows, rems, abits = [], [], []
        idxs = []
        for idx_q, n_blocks in bucket_queries(nblk_q):
            bq = 1 << int(np.ceil(np.log2(max(len(idx_q), 1))))
            sr = np.zeros((n_shards, bq, 1, n_blocks), np.int32)
            rm = np.zeros((n_shards, bq, 1, n_blocks), np.int32)
            ab = np.zeros((n_shards, bq, 1, n_blocks), np.int32)
            for i, h in enumerate(idx.hosts):
                r_sub = np.zeros((bq, s), np.int32)
                a_sub = np.zeros((bq, s), F32)
                r_sub[: len(idx_q)] = rows[i, idx_q]
                a_sub[: len(idx_q)] = coeffs[i, idx_q]
                sr[i], rm[i], ab[i] = plan_tables(
                    h.row_start, h.indptr, r_sub, a_sub, n_blocks, block
                )
            srcrows.append(jax.device_put(sr, shard0))
            rems.append(jax.device_put(rm, shard0))
            abits.append(jax.device_put(ab, shard0))
            buckets.append((n_blocks, block))
            idxs.append(idx_q)
        vals, gids = _sharded_batch_step(
            idx.post_doc,
            idx.post_val,
            idx.doc_base,
            tuple(srcrows),
            tuple(rems),
            tuple(abits),
            k=k,
            plan=(s, tuple(buckets)),
            d_pad=idx.d_pad,
            scale=scale,
            clip=clip,
            mode=self.scorer_mode,
            # a forced Pallas mode on a non-TPU mesh runs in interpreter
            # mode (correct, slow) instead of failing to compile — this
            # is also how the 8-virtual-device CPU mesh tests execute
            # the production fused-in-shard_map configuration
            interpret=(self.mesh.devices.flat[0].platform != "tpu"),
            mesh_=self.mesh,
        )
        return vals, gids, idxs, nq, k

    def _collect(self, fut):
        vals, gids, idxs, nq, k = fut
        out_g = np.full((nq, k), -1, np.int64)
        out_v = np.full((nq, k), -1, np.int64)
        gids_h, vals_h = np.asarray(gids), np.asarray(vals)
        off = 0
        for idx_q in idxs:
            bq = 1 << int(np.ceil(np.log2(max(len(idx_q), 1))))
            out_g[idx_q] = gids_h[off : off + len(idx_q)]
            out_v[idx_q] = vals_h[off : off + len(idx_q)]
            off += bq
        return out_g, out_v
