"""SearchEngine: the user-facing API (SURVEY.md §1 L6).

build -> search -> add/delete/compact -> save/load -> hybrid rerank over
the TPU-native stack: batched host analyzer frontend, device CSR
segments, mixed-block bucketed packed scorer (ops/packed.py,
ops/schedule.py), multi-segment merge. The sharded multi-chip engine
lives in parallel/dist.py.

Serving path: every (segment x bucket) sub-program of a batch runs inside
ONE fused jit dispatch. Per bucket the host ships only the padded
(bq, S) term rows and coefficient bits — two small H2D transfers — and
the (bq, 1, NB) DMA plan tables are expanded ON DEVICE inside the same
program (ops/fused_pallas.expand_plan_tables), so per-batch host work is
analysis + row lookup + bucketing only. `search_stream` keeps a depth-N
in-flight window so device compute overlaps the host->device round-trip
— the same structure the throughput benchmark measures.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig
from ..index import builder
from ..index.csr import GlobalStats, SegmentDevice, SegmentHost, merge_stats
from ..ops.schedule import DEFAULT_FAMILIES, FUSED_FAMILIES, plan_batch
from ..oracle import spec
from .query import QueryFrontend, segment_rows

F32 = np.float32


def _pow2_at_least(n: int, lo: int = 1) -> int:
    n = max(n, lo)
    return 1 << int(np.ceil(np.log2(n)))


@partial(
    jax.jit,
    static_argnames=(
        "plan", "k", "scale", "clip", "mode", "n_real", "interpret",
        "split_p",
    ),
)
def _batch_step(
    post_docs,  # tuple of per-segment (X, 128) i32 doc planes
    post_vals,  # tuple of per-segment (X, 128) i32 val planes
    doc_bases,  # (n_segments,) i32
    indptrs,  # tuple of per-segment (T+1,) i32 device indptr
    row_starts,  # tuple of per-segment (T,) i32 device aligned starts
    rows_cat,  # (sum of bucket bq, S) i32 term rows, all buckets stacked
    cbits_cat,  # (sum of bucket bq, S) i32 bitcast-f32 coefficients
    plan,  # static: per segment (n_docs, s, ((n_blocks, block, bq), ...))
    k: int,
    scale: float,
    clip: float,
    mode: str,  # "fused" | "fused_dv" | "xla" | "xla_rank"
    n_real: int = 0,  # readback-trim gather size (0 = padded output)
    interpret: bool = False,
    cols_cat=None,  # (sum bq, 2) i32 piece quantile cols (split mode)
    offs_devs=None,  # tuple of per-segment (T, P+1) i32 quantile tables
    split_p: int = 0,  # static: quantile columns P (0 = splitting off)
):
    """One XLA program for the whole batch: every (segment x bucket)
    sub-program runs in a single dispatch (the structure the throughput
    benchmark measures — round-1 VERDICT asked for it in the serving
    path). The (bq, 1, NB) DMA plan tables are expanded on device from
    the shipped (bq, S) rows/coeff-bits (round-2 VERDICT: the host-side
    numpy expansion + its H2D was ~25% of serving time). mode picks the
    fused Pallas DMA+score+rank kernel (TPU production) or its
    bit-identical XLA twin over the same plan tables.
    Returns ONE int32 array — per-bucket vals and gids stacked in plan
    order, [vals | gids] side by side — so a batch costs exactly one
    device->host readback (the dev tunnel serializes transfers at
    ~35 ms; per-bucket reads would dominate serving). With n_real > 0
    (the production dispatch) the pow-2 bq padding rows are dropped
    ON DEVICE before the readback: rows_cat carries n_real gather
    indices folded into its tail (same H2D transfer), and the output
    is the gathered (n_real, 2k) — n_real = nq * n_segments, which is
    traffic-stable, so the jit signature space is unchanged."""
    from ..ops.fused_pallas import expand_plan_tables, fused_search_pallas
    from ..ops.packed import search_packed_tables

    out_v, out_g = [], []
    off = 0
    for si, (n_docs, s, buckets) in enumerate(plan):
        for n_blocks, block, bq, r_c in buckets:
            rows_b = jax.lax.slice_in_dim(rows_cat, off, off + bq)
            cbits_b = jax.lax.slice_in_dim(cbits_cat, off, off + bq)
            if split_p:
                # doc-range splitting: plan rows are PIECES; their
                # record ranges gather from the resident quantile table
                # and the kernel masks arrivals to [d_lo, d_hi)
                cols_b = jax.lax.slice_in_dim(cols_cat, off, off + bq)
                dlim = (
                    (cols_b * jnp.int32(n_docs)) // jnp.int32(split_p)
                ).reshape(bq, 1, 2)
            else:
                cols_b = dlim = None
            off += bq
            sr, rm, ab, dst = expand_plan_tables(
                row_starts[si], indptrs[si], rows_b, cbits_b,
                n_blocks, block,
                offs_dev=offs_devs[si] if split_p else None,
                cols=cols_b,
            )
            # the kernel returns top-k in one lane vector (k <= 128);
            # larger k falls back to the bit-identical XLA twin (the
            # dispatcher downgrades fused_dv to fused first, so the
            # dv-plane tuple never reaches the twin)
            if mode in ("fused", "fused_dv") and k <= 128:
                from ..ops.fused_pallas import pick_stack

                if mode == "fused_dv":
                    # post_docs carries the (X, 256) interleaved doc|val
                    # planes (ops/fused_dv.py): ONE DMA per block
                    from ..ops.fused_dv import fused_search_dv_pallas

                    v, dloc = fused_search_dv_pallas(
                        post_docs[si],
                        sr,
                        rm,
                        ab,
                        dst,
                        n_blocks=n_blocks,
                        block=block,
                        s=s,
                        k=k,
                        n_docs=n_docs,
                        scale=scale,
                        clip=clip,
                        r_c=r_c,
                        q_stack=pick_stack(bq, r_c),
                        interpret=interpret,
                    )
                else:
                    v, dloc = fused_search_pallas(
                        post_docs[si],
                        post_vals[si],
                        sr,
                        rm,
                        ab,
                        dst,
                        n_blocks=n_blocks,
                        block=block,
                        s=s,
                        k=k,
                        n_docs=n_docs,
                        scale=scale,
                        clip=clip,
                        r_c=r_c,
                        q_stack=pick_stack(bq, r_c),
                        interpret=interpret,
                        dlim=dlim,
                    )
                g = jnp.where(v > 0, dloc + doc_bases[si], -1)
            else:
                v, g = search_packed_tables(
                    post_docs[si],
                    post_vals[si],
                    sr,
                    rm,
                    ab,
                    jnp.float32(scale),
                    jnp.float32(clip),
                    doc_bases[si],
                    n_blocks=n_blocks,
                    block=block,
                    s=s,
                    k=k,
                    n_docs=n_docs,
                    # the rank kernel also stores top-k in one lane
                    # vector; larger k uses the XLA rank tail
                    use_rank_pallas=(mode == "xla_rank" and k <= 128),
                    rank_interpret=interpret,
                    dlim=dlim,
                )
            out_v.append(v)
            out_g.append(g)
    stacked = jnp.concatenate(
        [jnp.concatenate(out_v, 0), jnp.concatenate(out_g, 0)], 1
    )
    if not n_real:
        return stacked
    s_cols = rows_cat.shape[1]
    n_extra = -(-n_real // s_cols)
    idx_flat = jax.lax.slice_in_dim(
        rows_cat, off, off + n_extra
    ).reshape(-1)[:n_real]
    return jnp.take(stacked, idx_flat, axis=0)


def pipelined_stream(query_batches, depth, analyze_job, dispatch_job):
    """Shared serving-loop scaffolding for both engines' search_stream:
    a worker thread prefetches analysis up to 2 batches ahead while the
    main thread dispatches and drains a depth-N in-flight window.
    analyze_job(queries) -> analysis snapshot or None (must be safe to
    run on a worker thread); dispatch_job(queries, analysis) -> a thunk
    producing that batch's (ids, scores) when called."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    inflight: deque = deque()  # thunks producing (ids, scores)
    an_q: deque = deque()  # (queries, analysis future)
    it = iter(query_batches)
    with ThreadPoolExecutor(max_workers=1) as pool:

        def submit_next() -> bool:
            try:
                queries = next(it)
            except StopIteration:
                return False
            if not isinstance(queries, (list, tuple)):
                queries = list(queries)
            an_q.append((queries, pool.submit(analyze_job, queries)))
            return True

        for _ in range(2):  # analysis lookahead window
            if not submit_next():
                break
        while an_q:
            queries, fut_an = an_q.popleft()
            res = fut_an.result()
            submit_next()
            inflight.append(dispatch_job(queries, res))
            if len(inflight) >= depth:
                yield inflight.popleft()()
        while inflight:
            yield inflight.popleft()()


def delete_from_hosts(hosts, global_ids) -> bool:
    """Vectorized tombstone + exact df decrement over a list of
    SegmentHost (shared by both engines' delete_docs). Hosts must cover
    ascending contiguous global-id ranges (the append-only doc_base
    invariant both engines maintain). Returns True when any doc died.

    Work per call: one searchsorted over the segment bases, and per
    affected segment one ragged gather of the dead docs' term hashes,
    one vocab lookup and one np.subtract.at — no per-doc Python loop."""
    from ..index.csr import ragged_positions

    if not hosts:
        return False
    gids = np.unique(np.asarray(list(global_ids), dtype=np.int64))
    if gids.size == 0:
        return False
    bases = np.array([h.doc_base for h in hosts], np.int64)
    ends = bases + np.array([h.n_docs for h in hosts], np.int64)
    # the searchsorted bucketing below is only correct under the
    # append-only invariant both engines maintain: segment/shard global
    # id ranges are ascending and contiguous from 0 (round-4 VERDICT
    # asked for this to be asserted, not assumed)
    assert bases[0] == 0 and np.all(bases[1:] == ends[:-1]), (
        "delete_from_hosts requires ascending contiguous doc_base ranges"
    )
    si_of = np.searchsorted(bases, gids, side="right") - 1
    in_range = (si_of >= 0) & (gids < ends[np.clip(si_of, 0, None)])
    changed = False
    for si in np.unique(si_of[in_range]):
        host = hosts[si]
        ld = gids[in_range & (si_of == si)] - host.doc_base
        ld = ld[host.alive[ld]]
        if ld.size == 0:
            continue
        host.alive[ld] = False
        starts = host.doc_ptr[ld]
        lens = (host.doc_ptr[ld + 1] - starts).astype(np.int64)
        pos = ragged_positions(starts, lens)
        rows = np.searchsorted(host.term_hash, host.doc_hashes[pos])
        np.subtract.at(host.df, rows, 1)
        changed = True
    return changed


def synth_warmup_analysis(stats, config, nq: int, terms_per_query: int,
                          seed: int):
    """Synthetic pre-analyzed warmup batch shared by both engines'
    warmup(): terms sampled df-weighted from the index vocabulary, so
    heavy and light queries both appear and the plan layout cache seeds
    a grid close to production traffic's. Returns
    (slot_h, coeff, rows_g, found_g) or None when there is nothing to
    sample (empty vocab / all-zero df)."""
    if len(stats.vocab) == 0:
        return None
    rng = np.random.default_rng(seed)
    df = np.maximum(stats.df.astype(np.float64), 0.0)
    if df.sum() <= 0:
        return None
    tpq = max(1, min(terms_per_query, config.max_query_terms))
    rows = rng.choice(
        len(stats.vocab), size=(nq, tpq), p=df / df.sum()
    ).astype(np.int32)
    s_full = config.max_query_terms
    slot_h = np.zeros((nq, s_full), np.uint64)
    coeff = np.zeros((nq, s_full), F32)
    rows_g = np.zeros((nq, s_full), np.int32)
    found_g = np.zeros((nq, s_full), bool)
    slot_h[:, :tpq] = stats.vocab[rows]
    coeff[:, :tpq] = F32(1.0)
    rows_g[:, :tpq] = rows
    found_g[:, :tpq] = True
    return slot_h, coeff, rows_g, found_g


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
        # None = auto ("fused" Pallas DMA+score+rank kernel on TPU, "xla"
        # dynamic-slice scorer elsewhere); "xla_rank" = XLA pack + Pallas
        # rank kernel. All modes are bit-identical (tested).
        self.scorer: str | None = None
        # jit device-side CSR pack + value materialization (the
        # BASELINE.json:5 "index build is itself a jit-compiled batch
        # job"); the host build remains as the tested-equal fallback
        self.device_build: bool = True
        # segment lifecycle policy (round-2 VERDICT #5): every add_docs
        # appends a segment (a recompile + a merge column each), and
        # tombstoned postings cost scan work until compacted. Compact
        # automatically when either bound is crossed; None disables.
        # Threshold measured on hardware (tools/segments_bench.py,
        # round-4): serving is flat through 4 segments (100/103/97%),
        # then falls off — 80% at 8, 53% at 16 — while compile+warmup
        # grows ~2x across the sweep; 4 keeps the curve's flat region.
        self.auto_compact_segments: int | None = 4
        self.auto_compact_dead_frac: float | None = 0.5
        # None = scorer-tuned block families (ops/schedule.py); override
        # with ((threshold, block), ..., (None, block)) to A/B schedules
        self.block_families = None
        # smallest per-bucket n_blocks budget (pow-2). Lower = tighter
        # programs for light queries (a 1-block bucket runs no merge
        # network at all), higher = fewer jit variants.
        self.plan_min_blocks = 4
        # stable compiled-plan layouts (ops/plan_cache.py): natural
        # per-batch bucket plans are fitted into a per-engine canonical
        # grid so a serving process converges to ONE program per
        # (segments, s, k, mode) instead of one per batch. None = every
        # batch compiles its natural plan (the round-3 behavior).
        from ..ops.plan_cache import PlanLayoutCache

        self.plan_cache: PlanLayoutCache | None = PlanLayoutCache()
        # Doc-range splitting (ops/schedule.py split_pieces): queries
        # needing more compacted candidate rows than this split into
        # doc-disjoint pieces that rank in smaller (superlinearly
        # cheaper) regions and merge exactly. Default OFF — the round-4
        # adoption (+7.3% at the time) REVERSED in the round-5 sweep on
        # the same protocol (tools/step_ab.py, 1M docs, 8192q):
        # split0 ~66 ms vs split64 ~70.6 ms clean-window (-6.5%), and
        # the split path's extra per-piece sub-programs make it far
        # more sensitive to tunnel/dispatch weather (86.8 ms worst leg
        # vs 75.1 for off). Set an int (e.g. 64) to enable. Only the
        # fused scorer with a single block family takes the split path
        # (_split_active); other configs ignore the threshold.
        self.split_rows: int | None = None

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
        self._maybe_auto_compact()
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
        # finalize through the lifecycle policy: serving degrades with
        # fragmentation (measured curve in tools/segments_bench.py —
        # 80% at 8 segments, 53% at 16), so a many-batch build should
        # not leave its per-batch segments behind. One compact here is
        # O(corpus), same order as the build itself; opt out with
        # auto_compact_segments=None to keep the fragmentation.
        self._maybe_auto_compact()

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
        # segments whose term table IS the global vocabulary (the common
        # single-segment/compacted case) can reuse the frontend's vocab
        # lookup as their row table — no second binary search per batch.
        # Invalidated here, recomputed lazily in _dispatch (checkpoint
        # load constructs engines without a refresh).
        self._rows_global = None

    def delete_docs(self, global_ids) -> None:
        """Tombstone docs and update df/N/total_len exactly from the
        per-doc term lists kept in SegmentHost.

        Fully vectorized (round-3 VERDICT: the per-id Python loop made a
        100k-doc delete minutes of host work): ids are bucketed by
        segment with ONE searchsorted over the segment bases, each
        affected segment does ONE ragged gather of its dead docs' term
        hashes + ONE row lookup + ONE batched df decrement, then the
        single device refresh runs as before."""
        changed = delete_from_hosts(
            [h for h, _ in self.segments], global_ids
        )
        if changed:
            self._refresh_stats_and_vals()
            self._maybe_auto_compact()

    def _maybe_auto_compact(self) -> None:
        """Apply the segment lifecycle policy: compact when the segment
        count exceeds auto_compact_segments or when tombstoned docs'
        postings exceed auto_compact_dead_frac of all postings (a
        long-lived incremental index stays bounded without manual
        compact() calls — tested by the add/delete fuzz)."""
        if not self.segments:
            return
        if (
            self.auto_compact_segments is not None
            and len(self.segments) > self.auto_compact_segments
        ):
            self.compact()
            return
        if self.auto_compact_dead_frac is None:
            return
        dead_nnz, total_nnz = 0, 0
        for host, _ in self.segments:
            lens = np.diff(host.doc_ptr)
            dead_nnz += int(lens[~host.alive].sum())
            total_nnz += int(lens.sum())
        if total_nnz and dead_nnz / total_nnz > self.auto_compact_dead_frac:
            self.compact()

    def compact(self) -> None:
        """Merge all segments into one, physically dropping tombstoned
        docs' postings. Global doc ids are stable (dead ids keep empty
        slots); search results are identical before and after (tested).

        Fully vectorized (round-4 VERDICT #2: the per-doc Python loop
        made compacting a 1M-doc engine minutes of host work while the
        sharded twin was already vectorized): per segment ONE
        np.repeat keep-mask over the doc_ptr lens selects the alive
        docs' postings, and segments cover contiguous global-id ranges
        so lens/dl/dead scatter as slices — no per-doc loop. Timing
        test: tests/test_engine_features.py (compact_scales)."""
        if not self.segments:
            return
        n = self.n_docs_total
        hashes_parts, tfs_parts, ptr = [], [], np.zeros(n + 1, np.int64)
        dl = np.zeros(n, np.int32)
        dead = np.zeros(n, bool)
        for host, _ in self.segments:
            lens = np.diff(host.doc_ptr).astype(np.int64)
            keep_doc = host.alive
            keep_post = np.repeat(keep_doc, lens)
            lo, hi = host.doc_base, host.doc_base + host.n_docs
            ptr[lo + 1 : hi + 1] = np.where(keep_doc, lens, 0)
            dl[lo:hi] = np.where(keep_doc, host.dl, np.int32(0))
            dead[lo:hi] = ~keep_doc
            hashes_parts.append(host.doc_hashes[keep_post])
            tfs_parts.append(host.doc_tfs[keep_post])
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
    def _device_embeddings(self, dim: int):
        """Device-resident int8 feature-hash embeddings + squared norms
        for the whole corpus, built ON DEVICE from the resident posting
        planes (jit scatter-add, ops/rerank.py) and cached until the next
        stats refresh. int8 keeps an 8M-doc dim-256 table at 2 GB."""
        from ..ops.rerank import device_doc_embeddings_int, term_projection

        cache = getattr(self, "_emb_cache", None)
        if cache is None:
            cache = self._emb_cache = {}
        if dim in cache:
            return cache[dim]
        embs, ssqs = [], []
        for host, device in self.segments:
            if host.n_terms == 0 or host.n_docs == 0:
                # empty-vocabulary segment (e.g. all-stopword docs):
                # nothing projects; its docs embed as zero vectors
                embs.append(jnp.zeros((host.n_docs, dim), jnp.int8))
                ssqs.append(jnp.zeros((host.n_docs,), jnp.int32))
                continue
            col, sign = term_projection(host.term_hash, dim)
            e, ss = device_doc_embeddings_int(
                device.post_doc,
                device.post_val,
                device.row_start,
                jnp.asarray(col),
                jnp.asarray(sign),
                n_docs=host.n_docs,
                dim=dim,
            )
            embs.append(e)
            ssqs.append(ss)
        emb = jnp.concatenate(embs, axis=0)
        ssq = jnp.concatenate(ssqs, axis=0)
        cache[dim] = (emb, ssq)
        return cache[dim]

    def search_rerank(
        self,
        queries,
        k: int = 10,
        dim: int = 256,
        candidates: int = 64,
        interpret: bool | None = None,
    ):
        """Hybrid retrieval (BASELINE.json:11): lexical candidate gen,
        then dense feature-hash rerank — candidates are gathered and
        dot-scored ON DEVICE (exact integer dots on the MXU); only the
        final f64 cosine + quantized ordering runs on host, from exact
        integers, so rankings are deterministic on every backend.
        Returns (ids, rerank_scores_int, lexical_scores_int), ranked
        (rerank desc, lexical desc, gid asc)."""
        from ..ops.rerank import (
            gather_and_dot,
            query_embeddings_int,
            rerank_order_int,
        )

        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        kk = max(k, candidates)
        nq = len(queries)
        if nq == 0 or self.n_docs_total == 0 or not self.segments:
            gids, lex = self.search(queries, k=kk)
            ri = np.full((nq, k), -1, np.int64)
            return gids[:, :k], ri, lex[:, :k]
        # ONE frontend pass feeds both stages (round-3 VERDICT: the
        # candidate-gen search and the rerank each re-analyzed the batch
        # — double the frontend tax for identical results)
        slot_h, coeff, rows_g, found_g = self.frontend.analyze_rows(
            queries, self.stats
        )
        gids, lex = self._collect(
            self._dispatch(slot_h, coeff, kk, rows_g, found_g)
        )
        qemb, ssq_q = query_embeddings_int(slot_h, coeff, dim)
        emb, ssq = self._device_embeddings(dim)
        dots, cand_ssq = gather_and_dot(
            emb,
            ssq,
            jnp.asarray(qemb),
            jnp.asarray(gids.astype(np.int32)),
            interpret=interpret,
        )
        return rerank_order_int(
            np.asarray(dots), ssq_q, np.asarray(cand_ssq), lex, gids, k
        )

    def save(self, path: str) -> None:
        from ..index.checkpoint import save_engine

        save_engine(self, path)

    @classmethod
    def load(cls, path: str) -> "SearchEngine":
        from ..index.checkpoint import load_engine

        return load_engine(path, engine_cls=cls)

    # ------------------------------------------------------------ search
    @property
    def scorer_mode(self) -> str:
        """Active scorer: "fused" (Pallas DMA+score+rank, TPU default),
        "fused_dv" (fused over interleaved doc|val planes — ONE DMA per
        block, ops/fused_dv.py), "xla" (dynamic-slice pack + XLA rank,
        portable default), or "xla_rank" (XLA pack + Pallas rank
        kernel). Bit-identical."""
        if self.scorer is not None:
            return self.scorer
        return (
            "fused" if jax.devices()[0].platform == "tpu" else "xla"
        )

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
            slot_h, coeff, rows_g, found_g = self.frontend.analyze_rows(
                queries, self.stats
            )
        with prof.phase("search.score"):
            fut = self._dispatch(slot_h, coeff, k, rows_g, found_g)
            return self._collect(fut)

    def search_stream(self, query_batches, k: int = 10, depth: int = 2):
        """Pipelined serving loop: yields (ids, scores) per input batch,
        keeping up to `depth` batches in flight so device compute overlaps
        the host->device round trip (the production serving structure;
        `search` is the depth-1 special case). Text analysis for the
        next batches runs on a worker thread — the numpy/native frontend
        releases the GIL, so it overlaps the main thread's device waits
        instead of extending the serving period. Analysis is re-run
        synchronously if the engine was mutated (add/delete/compact)
        between prefetch and dispatch — prefetched row tables are only
        valid against the stats snapshot they were built from."""

        def analyze_job(queries):
            stats = self.stats  # snapshot: identity-checked at dispatch
            if len(queries) == 0 or not self.segments:
                return None
            return (stats, self.frontend.analyze_rows(queries, stats))

        def dispatch_job(queries, res):
            if res is not None and res[0] is not self.stats:
                res = analyze_job(queries)  # engine mutated mid-stream
            if res is None and len(queries) and self.segments:
                res = analyze_job(queries)  # built mid-stream
            if res is None:
                nq = len(queries)
                empty = (
                    np.full((nq, k), -1, np.int64),
                    np.full((nq, k), -1, np.int64),
                )
                return lambda e=empty: e
            _stats, (slot_h, coeff, rows_g, found_g) = res
            fut = self._dispatch(slot_h, coeff, k, rows_g, found_g)
            return partial(self._collect, fut)

        yield from pipelined_stream(
            query_batches, depth, analyze_job, dispatch_job
        )

    def warmup(
        self,
        queries=None,
        nq: int = 8192,
        k: int = 10,
        terms_per_query: int = 8,
        seed: int = 0,
    ) -> None:
        """Precompile the serving program before traffic arrives
        (round-3 VERDICT: cold start to first query was minutes).

        With `queries` (a representative recorded batch) this is just
        one search. Without, a synthetic batch is built by sampling
        terms df-weighted from the index vocabulary — heavy and light
        queries both appear, so the plan layout cache seeds a grid
        close to production traffic's and later real batches reuse the
        one compiled program (growing it at most once or twice).
        `terms_per_query` must match production traffic's active-slot
        width (slice_active_slots makes it a jit signature dimension).
        """
        if not self.segments or self.n_docs_total == 0:
            return
        if queries is not None:
            self.search(queries, k=k)
            return
        batch = synth_warmup_analysis(
            self.stats, self.config, nq, terms_per_query, seed
        )
        if batch is None:
            return
        slot_h, coeff, rows_g, found_g = batch
        self._collect(self._dispatch(slot_h, coeff, k, rows_g, found_g))

    def _plan_key(self, si, host, s, k, mode, families):
        """Plan-layout cache key: everything static about the compiled
        program besides the bucket grid itself. preplan() and _dispatch
        MUST build identical keys or seeding is wasted."""
        return (
            si, host.n_docs, host.n_terms, s, k, mode,
            families, self.plan_min_blocks, self.split_rows,
        )

    def _doc_quantiles(self, host, device):
        """(host_offs (T, P+1) i32, device copy) per-row doc-quantile
        table for doc-range splitting (builder.host_row_doc_quantiles /
        device_row_doc_quantiles). Cached per segment and validated
        against the CURRENT doc plane identity — jnp arrays are
        immutable, so any postings change swaps the plane object and
        invalidates the entry."""
        from ..index import builder as B

        cache = getattr(self, "_quant_cache", None)
        if cache is None:
            cache = self._quant_cache = {}
        # prune dropped segments: entries hold device-plane refs, so a
        # stale entry would keep a compacted-away segment's HBM alive
        live = {id(h) for h, _ in self.segments}
        for stale in [kk for kk in cache if kk not in live]:
            del cache[stale]
        key = id(host)
        ent = cache.get(key)
        if ent is not None and ent[0] is device.post_doc:
            return ent[1], ent[2]
        p = B.SPLIT_QUANTILES
        if host.post_doc is not None:
            offs = B.host_row_doc_quantiles(
                host.indptr, host.post_doc, p, host.n_docs
            )
        else:
            offs = np.asarray(
                B.device_row_doc_quantiles(
                    device.post_doc, device.indptr, device.row_start,
                    p, host.n_docs,
                )
            )
        dev = jnp.asarray(offs)
        cache[key] = (device.post_doc, offs, dev)
        return offs, dev

    def _split_active(self, mode, k, families) -> bool:
        """Splitting serves only the production fused single-family
        config (ops/schedule.py split_pieces rationale)."""
        return (
            self.split_rows is not None
            and mode == "fused"
            and k <= 128
            and len(families) == 1
        )

    def _segment_plan(
        self, host, device, rows, found, a_seg, families, mode, k
    ):
        """Shared by preplan and _dispatch: the per-segment natural plan
        plus (when splitting) the piece table. Returns (rows_p, a_p,
        cols, qidx, pno, natural); cols/qidx/pno are None when the plan
        rows are the queries themselves."""
        compact = mode.startswith("fused") and k <= 128
        # empty segments have no quantile table (T = 0) and nothing to
        # split; they take the unsplit path (zero blocks either way)
        if not self._split_active(mode, k, families) or len(
            host.indptr
        ) < 2:
            natural = plan_batch(
                host.indptr, rows, found, families=families,
                min_blocks=self.plan_min_blocks, compact=compact,
            )
            return rows, a_seg, None, None, None, natural
        from ..index import builder as B
        from ..ops.schedule import split_pieces

        offs_h, _offs_d = self._doc_quantiles(host, device)
        blk = families[0][1]
        lens = (host.indptr[rows + 1] - host.indptr[rows]) * found
        qidx, pno, cols, lens_p = split_pieces(
            lens, rows, offs_h, self.split_rows, blk,
            B.SPLIT_QUANTILES,
        )
        rows_p = rows[qidx]
        a_p = a_seg[qidx]
        natural = plan_batch(
            host.indptr, rows_p, found[qidx], families=families,
            min_blocks=self.plan_min_blocks, compact=compact,
            lens=lens_p,
        )
        return rows_p, a_p, cols, qidx, pno, natural

    def _seg_rows_global(self):
        """Per-segment flag: this segment's term table IS the global
        vocabulary (the frontend's rows_g/found_g apply directly).
        Computed lazily so every construction path benefits."""
        seg_global = getattr(self, "_rows_global", None)
        if seg_global is None or len(seg_global) != len(self.segments):
            seg_global = self._rows_global = [
                np.array_equal(h.term_hash, self.stats.vocab)
                for h, _ in self.segments
            ]
        return seg_global

    def _dv_planes(self):
        """Per-segment (X, 256) interleaved doc|val planes for the
        single-DMA fused_dv kernel (ops/fused_dv.py), derived ON DEVICE
        and cached by source-plane identity — add/delete/compact swap
        the plane objects, which invalidates the cache entry."""
        from ..ops.fused_dv import interleave_planes

        cache = getattr(self, "_dv_cache", None)
        if cache is None:
            cache = self._dv_cache = {}
        out = []
        for si, (_host, device) in enumerate(self.segments):
            key = (id(device.post_doc), id(device.post_val))
            ent = cache.get(si)
            if ent is None or ent[0] != key:
                ent = (
                    key,
                    interleave_planes(device.post_doc, device.post_val),
                )
                cache[si] = ent
            out.append(ent[1])
        for si in list(cache):
            if si >= len(self.segments):
                del cache[si]
        return tuple(out)

    def preplan(self, query_batches, k: int = 10) -> None:
        """Host-only: converge the plan-layout cache over representative
        query batches BEFORE the first dispatch (pure numpy — no device
        work, no compiles). Serving then compiles ONE program per
        traffic shape instead of one per layout generation; on the dev
        tunnel each extra generation costs ~a minute of executable
        upload. Call with recorded traffic at process start; warmup()
        (or the first real batch) compiles the converged layout."""
        if self.plan_cache is None or not self.segments:
            return
        mode = self.scorer_mode
        if mode == "fused_dv" and k > 128:
            mode = "fused"  # large-k serves via the XLA twin (_dispatch)
        families = self.block_families or (
            FUSED_FAMILIES if mode.startswith("fused") else DEFAULT_FAMILIES
        )
        per_key: dict = {}
        for queries in query_batches:
            slot_h, coeff, rows_g, found_g = self.frontend.analyze_rows(
                queries, self.stats
            )
            n_slots = slot_h.shape[1]
            slot_h, coeff = slice_active_slots(slot_h, coeff)
            nq, s = coeff.shape
            if rows_g is not None and s != n_slots:
                rows_g, found_g = rows_g[:, :s], found_g[:, :s]
            seg_global = self._seg_rows_global()
            for si, (host, device) in enumerate(self.segments):
                if rows_g is not None and seg_global[si]:
                    rows, found = rows_g, found_g
                else:
                    rows, found = segment_rows(host.term_hash, slot_h)
                a_seg = np.where(found, coeff, F32(0.0)).astype(F32)
                rows_p, _a_p, _cols, _qidx, _pno, natural = (
                    self._segment_plan(
                        host, device, rows, found, a_seg, families,
                        mode, k,
                    )
                )
                key = self._plan_key(si, host, s, k, mode, families)
                ent = per_key.setdefault(key, [0, []])
                ent[0] = max(ent[0], rows_p.shape[0])
                ent[1].append(natural)
        for key, (nq, naturals) in per_key.items():
            self.plan_cache.seed_plans(key, naturals, nq)

    def _dispatch(self, slot_h, coeff, k: int, rows_g=None, found_g=None):
        """Host planning + ONE fused device dispatch for a query batch.

        Host work per batch: slot->row lookup per segment (skipped for
        segments whose term table is the global vocabulary when the
        frontend's rows_g/found_g are provided — the common compacted
        case), mixed-block bucketing, and slicing the padded (bq, S)
        rows/coeff arrays per bucket. Those two small arrays per bucket
        are the only H2D; the DMA plan tables expand on device inside
        the batch step. Returns the in-flight device outputs plus
        assembly metadata, so callers can pipeline batches
        (search_stream) before forcing D2H.
        """
        mode = self.scorer_mode
        if mode == "fused_dv" and k > 128:
            # large k serves via the XLA twin over the standard planes —
            # never hand the twin a dv-plane tuple
            mode = "fused"
        n_slots = slot_h.shape[1]
        slot_h, coeff = slice_active_slots(slot_h, coeff)
        nq, s = coeff.shape
        if rows_g is not None and s != n_slots:
            rows_g, found_g = rows_g[:, :s], found_g[:, :s]
        sc = self.config.scoring
        scale = float(F32(2.0**sc.scale_bits))
        clip = float(
            F32(int(spec.quant_clip_max(self.config.max_query_terms)))
        )
        # block families are scorer-tuned: the fused kernel wants fewer,
        # larger DMAs (ops/schedule.py FUSED_FAMILIES rationale)
        families = self.block_families or (
            FUSED_FAMILIES if mode.startswith("fused") else DEFAULT_FAMILIES
        )
        plan = []  # static: per seg (n_docs, s, ((nb, blk, bq, rc), ...))
        idx_map = []  # per segment: list of plan-row index arrays
        piece_maps = []  # per segment: None | (qidx, pno, mmax, np_)
        r_subs, a_subs, c_subs = [], [], []
        split = self._split_active(mode, k, families)
        from ..index.builder import SPLIT_QUANTILES
        # computed lazily so every construction path benefits (the
        # checkpoint load path sets stats/segments directly without a
        # refresh — review finding)
        seg_global = self._seg_rows_global()
        for si, (host, device) in enumerate(self.segments):
            if rows_g is not None and seg_global[si]:
                rows, found = rows_g, found_g
            else:
                rows, found = segment_rows(host.term_hash, slot_h)
            a_seg = np.where(found, coeff, F32(0.0)).astype(F32)
            rows_p, a_p, cols, qidx, pno, natural = self._segment_plan(
                host, device, rows, found, a_seg, families, mode, k
            )
            n_rows_p = rows_p.shape[0]
            if self.plan_cache is not None:
                key = self._plan_key(si, host, s, k, mode, families)
                cells = self.plan_cache.canonicalize(
                    key, natural, n_rows_p
                )
            else:
                cells = [
                    (idx, nb, blk, rc, _pow2_at_least(len(idx)))
                    for idx, nb, blk, rc in natural
                ]
            buckets = []
            idxs = []
            for idx, n_blocks, block, r_c, bq in cells:
                r_sub = np.zeros((bq, s), np.int32)
                a_sub = np.zeros((bq, s), F32)
                r_sub[: len(idx)] = rows_p[idx]
                a_sub[: len(idx)] = a_p[idx]
                r_subs.append(r_sub)
                a_subs.append(a_sub)
                if split:
                    # padding rows (and whole segments that skipped
                    # splitting, e.g. empty ones): whole-row piece
                    # (0, P) — cols_cat must stay aligned with the
                    # bucket offsets across ALL segments
                    c_sub = np.zeros((bq, 2), np.int32)
                    c_sub[:, 1] = SPLIT_QUANTILES
                    if cols is not None:
                        c_sub[: len(idx)] = cols[idx]
                    c_subs.append(c_sub)
                buckets.append((n_blocks, block, bq, r_c))
                idxs.append((idx, bq))
            plan.append((host.n_docs, s, tuple(buckets)))
            idx_map.append(idxs)
            piece_maps.append(
                (qidx, pno, int(pno.max()) + 1 if len(pno) else 1,
                 n_rows_p)
                if cols is not None
                else None
            )
        doc_bases = jnp.asarray(
            np.array([h.doc_base for h, _ in self.segments], np.int32)
        )
        r_all = np.concatenate(r_subs, axis=0)
        # readback trim: the step gathers the real (non-pad) output rows
        # on device before the D2H (~22% of readback volume is pow-2 bq
        # padding). The gather index rides in rows_cat's tail — same
        # H2D transfer count. n_real = nq * n_segments (traffic-stable).
        offs = []
        off = 0
        for idxs in idx_map:
            for idx, bq in idxs:
                offs.append(off + np.arange(len(idx), dtype=np.int32))
                off += bq
        idx_flat = np.concatenate(offs)
        n_real = len(idx_flat)
        if split:
            # piece counts vary with traffic; quantize the gather size
            # so the jit signature space stays bounded (pad gathers row
            # 0 — junk rows past the consumed range, dropped by
            # _collect)
            n_real = -(-n_real // 256) * 256
        s_cols = r_all.shape[1]
        n_extra = -(-n_real // s_cols)
        tail = np.zeros(n_extra * s_cols, np.int32)
        tail[: len(idx_flat)] = idx_flat
        r_all = np.concatenate(
            [r_all, tail.reshape(n_extra, s_cols)], axis=0
        )
        outs = _batch_step(
            # fused_dv scores from the interleaved (X, 256) planes —
            # post_docs carries them; post_vals is unused by that path
            self._dv_planes()
            if mode == "fused_dv"
            else tuple(d.post_doc for _, d in self.segments),
            tuple(d.post_val for _, d in self.segments),
            doc_bases,
            tuple(d.indptr for _, d in self.segments),
            tuple(d.row_start for _, d in self.segments),
            # ONE stacked H2D pair per batch, sliced statically under jit
            jnp.asarray(r_all),
            jnp.asarray(np.concatenate(a_subs, axis=0).view(np.int32)),
            plan=tuple(plan),
            k=k,
            scale=scale,
            clip=clip,
            mode=mode,
            n_real=n_real,
            # a forced Pallas mode off-TPU runs in interpreter mode
            # instead of failing to compile (ADVICE.md round 2)
            interpret=(jax.devices()[0].platform != "tpu"),
            cols_cat=(
                jnp.asarray(np.concatenate(c_subs, axis=0))
                if split
                else None
            ),
            offs_devs=(
                tuple(
                    self._doc_quantiles(h, d)[1] for h, d in self.segments
                )
                if split
                else None
            ),
            split_p=SPLIT_QUANTILES if split else 0,
        )
        return outs, idx_map, piece_maps, nq, k

    def _collect(self, fut):
        """Force D2H on a dispatched batch and assemble (ids, scores) —
        ONE device->host read per batch (the stacked _batch_step out)."""
        out, idx_map, piece_maps, nq, k = fut
        host = np.asarray(out)
        all_vals, all_gids = [], []
        off = 0  # rows are the device-gathered REAL rows, bq pad dropped
        for idxs, pm in zip(idx_map, piece_maps):
            n_rows = nq if pm is None else pm[3]
            seg_v = np.full((n_rows, k), -1, np.int32)
            seg_g = np.full((n_rows, k), -1, np.int32)
            for idx, _bq in idxs:
                seg_v[idx] = host[off : off + len(idx), :k]
                seg_g[idx] = host[off : off + len(idx), k:]
                off += len(idx)
            if pm is not None:
                # doc-range pieces: scatter piece rows to (nq, mmax, k)
                # slots and merge per query by (score desc, gid asc) —
                # pieces are doc-disjoint, so this IS the unsplit
                # ranking (same argument as the segment merge below)
                qidx, pno, mmax, _np = pm
                if mmax == 1:
                    pass  # every piece is its query, already in order
                else:
                    pv = np.full((nq, mmax * k), -1, np.int32)
                    pg = np.full((nq, mmax * k), -1, np.int32)
                    pv3 = pv.reshape(nq, mmax, k)
                    pg3 = pg.reshape(nq, mmax, k)
                    pv3[qidx, pno] = seg_v
                    pg3[qidx, pno] = seg_g
                    order = np.lexsort(
                        (pg, -pv.astype(np.int64)), axis=-1
                    )[:, :k]
                    seg_v = np.take_along_axis(pv, order, axis=1)
                    seg_g = np.take_along_axis(pg, order, axis=1)
                    seg_g = np.where(seg_v > 0, seg_g, -1)
                    seg_v = np.where(seg_v > 0, seg_v, -1)
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
