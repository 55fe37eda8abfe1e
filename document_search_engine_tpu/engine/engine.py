"""SearchEngine: the user-facing API (SURVEY.md §1 L6).

build -> search -> add/delete/compact -> save/load -> hybrid rerank over
the TPU-native stack: batched host analyzer frontend, device CSR
segments, mixed-block bucketed packed scorer (ops/packed.py,
ops/schedule.py), multi-segment merge. The sharded multi-chip engine
lives in parallel/dist.py.
"""
from __future__ import annotations

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
        host, device = builder.build_segment(
            analyzed, self.config, doc_base=doc_base, materialize=False
        )
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
            host, device = builder.build_segment(
                analyzed, self.config, doc_base=self.n_docs_total,
                materialize=False,
            )
            self.segments.append([host, device])
            self.n_docs_total += host.n_docs
        self._refresh_stats_and_vals()

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
        host, device = builder.build_segment(
            analyzed, self.config, doc_base=0, materialize=False
        )
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
            slot_h, coeff = slice_active_slots(slot_h, coeff)
        sc = self.config.scoring
        scale = F32(2.0**sc.scale_bits)
        clip = F32(int(spec.quant_clip_max(self.config.max_query_terms)))
        s = coeff.shape[1]

        all_vals, all_gids = [], []
        with prof.phase("search.score"):
            return self._score_segments(
                slot_h, coeff, scale, clip, nq, k, s, all_vals, all_gids
            )

    def _score_segments(
        self, slot_h, coeff, scale, clip, nq, k, s, all_vals, all_gids
    ):
        for host, device in self.segments:
            rows, found = segment_rows(host.term_hash, slot_h)
            a_seg = np.where(found, coeff, F32(0.0)).astype(F32)
            seg_v = np.full((nq, k), -1, np.int32)
            seg_g = np.full((nq, k), -1, np.int32)
            # mixed-block pow-2 budget buckets (ops/schedule.py): the max
            # query doesn't set everyone's cost, and light queries use
            # fine blocks with less padding
            for idx, n_blocks, block in plan_batch(host.indptr, rows, found):
                bq = _pow2_at_least(len(idx))
                r_sub = np.zeros((bq, s), np.int32)
                a_sub = np.zeros((bq, s), F32)
                r_sub[: len(idx)] = rows[idx]
                a_sub[: len(idx)] = a_seg[idx]
                v, g = search_packed_ds(
                    device.post_rec,
                    device.indptr,
                    r_sub,
                    a_sub,
                    scale,
                    clip,
                    np.int32(host.doc_base),
                    n_blocks=n_blocks,
                    k=k,
                    n_docs=host.n_docs,
                    block=block,
                )
                seg_v[idx] = np.asarray(v)[: len(idx)]
                seg_g[idx] = np.asarray(g)[: len(idx)]
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
