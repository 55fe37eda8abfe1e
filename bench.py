"""Benchmark: batched queries/sec/chip (primary metric, BASELINE.json:2).

Runs a depth-pipelined serving loop over the production search step —
bucketed packed fixed-point scoring + ranked top-k (ops/packed.py,
ops/schedule.py) — at steady state on the real chip, reading each batch's
results back to host as serving would. Work in this step depends on
postings touched per query, not corpus size, so a 1M-doc single-chip run
approximates queries/sec/chip of an 8M-doc 8-chip document-sharded
deployment (each chip scores its local shard); an 8M single-chip config
is also supported directly (BENCH_DOCS=8000000).

The synthetic Zipf index is generated ON DEVICE under jit, in bounded
chunks: the axon dev tunnel's host->device path measures ~2-30 MB/s (plus
a ~400s one-time session claim), so shipping the index from host would
measure the tunnel, not the engine. Real TPU hosts feed HBM at GB/s.
Secondary metric (index build docs/sec, host analyzer + CSR pack) prints
to stderr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline is value / 10_000 (the BASELINE.json:5 target).

Env knobs: BENCH_DOCS (default 1_000_000), BENCH_NQ (1024), BENCH_K (10),
BENCH_ITERS (20), BENCH_KIND (bm25), BENCH_DEPTH (2, pipelining),
BENCH_DS_BLOCK (1024), BENCH_DS_ALT ("512,2048" same-index A/B report),
BENCH_AVG_TERMS (60), BENCH_PATH (ds | gather | pallas), BENCH_BUILD (1).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from document_search_engine_tpu.utils.cache import enable_persistent_cache


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def zipf_df(n_docs: int, vocab: int, avg_terms: int):
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    df = np.maximum(1, (probs * n_docs * avg_terms).astype(np.int64))
    return np.minimum(df, n_docs)


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    nq = int(os.environ.get("BENCH_NQ", 1024))
    k = int(os.environ.get("BENCH_K", 10))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    kind = os.environ.get("BENCH_KIND", "bm25")
    path = os.environ.get("BENCH_PATH", "ds")  # ds | gather | pallas
    use_pallas = path == "pallas" or os.environ.get("BENCH_PALLAS") == "1"
    vocab = max(50_000, n_docs // 5)
    avg_terms = int(os.environ.get("BENCH_AVG_TERMS", 60))

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.ops.pack_pallas import (
        BLOCK,
        block_plan,
    )
    from document_search_engine_tpu.ops.packed import (
        search_packed,
        search_packed_ds,
        search_packed_rec,
        total_cap,
    )
    from document_search_engine_tpu.oracle import spec

    log(f"platform: {jax.devices()[0].platform} x{len(jax.devices())}")
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))

    # secondary metric (BASELINE.json:2): index build docs/sec, host side
    # (analyzer + CSR pack) on a real text corpus
    if os.environ.get("BENCH_BUILD", "1") == "1":
        from document_search_engine_tpu.corpus.synth import synth_corpus
        from document_search_engine_tpu.index import builder as _builder

        bd = synth_corpus(n_docs=20000, vocab_size=30000, mean_len=120, seed=5)
        t0 = time.perf_counter()
        _a = _builder.analyze_texts_fast(bd, cfg)
        _h, _dev = _builder.build_segment(_a, cfg)
        dt = time.perf_counter() - t0
        log(
            f"index build: {len(bd)} docs in {dt:.2f}s -> "
            f"{len(bd)/dt:,.0f} docs/sec (analyze+pack+materialize, host)"
        )

    df = zipf_df(n_docs, vocab, avg_terms)
    nnz = int(df.sum())
    indptr64 = np.zeros(vocab + 1, np.int64)
    np.cumsum(df, out=indptr64[1:])
    indptr = indptr64.astype(np.int32)
    nnz_pad = ((nnz + BLOCK - 1) // BLOCK + 1) * BLOCK
    log(f"synth index: {n_docs} docs, {vocab} terms, nnz={nnz/1e6:.1f}M (device-side gen)")

    # chunked device-side generation: a single-shot gen at 8M docs
    # (156M postings) crashed the TPU worker; bounded chunks keep peak
    # memory flat and the first-chunk compile small.
    gen_chunk_elems = 1 << 24

    @jax.jit
    def gen_chunk(indptr_d, lens_d, key, start):
        i = start + jnp.arange(gen_chunk_elems, dtype=jnp.int32)
        row_of = jnp.searchsorted(indptr_d[1:], i, side="right").astype(
            jnp.int32
        )
        row_of = jnp.minimum(row_of, vocab - 1)
        pos = i - indptr_d[row_of]
        u = jax.random.uniform(key, (gen_chunk_elems,), jnp.float32)
        ln = jnp.maximum(lens_d[row_of], 1).astype(jnp.float32)
        doc = ((pos.astype(jnp.float32) + u) / ln * n_docs).astype(jnp.int32)
        doc = jnp.clip(doc, 0, n_docs - 1)
        val = jax.random.uniform(key, (gen_chunk_elems,), jnp.float32)
        val = val * 0.9 + 0.05
        pad = i >= nnz
        return jnp.where(pad, n_docs, doc), jnp.where(pad, 0.0, val)

    t0 = time.perf_counter()
    indptr_d = jnp.asarray(indptr)
    lens_d = jnp.asarray(df.astype(np.int32))
    key = jax.random.PRNGKey(1)
    dchunks, vchunks = [], []
    for c0 in range(0, nnz_pad, gen_chunk_elems):
        d_c, v_c = gen_chunk(
            indptr_d, lens_d, jax.random.fold_in(key, c0),
            jnp.int32(c0),
        )
        dchunks.append(d_c)
        vchunks.append(v_c)
    post_doc = jnp.concatenate(dchunks)[:nnz_pad]
    post_val = jnp.concatenate(vchunks)[:nnz_pad]
    del dchunks, vchunks
    @jax.jit
    def to_rec(d, v):
        return jnp.stack(
            [d, jax.lax.bitcast_convert_type(v, jnp.int32)], axis=1
        )

    post_rec = to_rec(post_doc, post_val)
    _ = np.asarray(post_rec[0, :1])
    log(f"index gen (device): {time.perf_counter()-t0:.1f}s")

    # queries over mid-frequency terms (engines drop stopword-level terms)
    s_slots = 8
    rng = np.random.default_rng(7)
    eligible = np.where((df >= 64) & (df <= 32768))[0]
    rows = rng.choice(eligible, size=(nq, s_slots)).astype(np.int32)
    coeff = (rng.random((nq, s_slots)).astype(np.float32) * 2.0 + 0.1)
    found = np.ones_like(rows, bool)
    c_total = total_cap(indptr, rows, found)
    ds_block = int(os.environ.get("BENCH_DS_BLOCK", 1024))
    n_blocks = (
        block_plan(indptr, rows, found, block=ds_block)
        if path == "ds"
        else block_plan(indptr, rows, found)
    )
    log(
        f"queries: nq={nq} slots={s_slots} packed_budget={c_total} "
        f"pallas_blocks={n_blocks} "
        f"(avg postings/query {int((indptr64[rows+1]-indptr64[rows]).sum(1).mean())}) "
        f"path={path}"
    )

    scale = jnp.float32(2.0**cfg.scoring.scale_bits)
    clip = jnp.float32(int(spec.quant_clip_max(cfg.max_query_terms)))
    rows_d = jnp.asarray(rows)
    coeff_d = jnp.asarray(coeff)

    if use_pallas:
        def step(rows_d, coeff_d):
            return search_packed_rec(
                post_rec, indptr_d, rows_d, coeff_d, scale, clip,
                jnp.int32(0), n_blocks=n_blocks, k=k, n_docs=n_docs,
            )
    elif path == "ds":
        from document_search_engine_tpu.ops.schedule import (
            blocks_per_query,
            bucket_queries,
            plan_batch,
        )

        def make_step(blocksize):
            # blocksize None -> mixed-block plan (the engine default)
            if blocksize is None:
                plans = plan_batch(indptr, rows, found)
            else:
                nblk_q = blocks_per_query(indptr, rows, found, blocksize)
                plans = [
                    (idx, nb, blocksize)
                    for idx, nb in bucket_queries(nblk_q)
                ]
            buckets = []
            for idx, nb, blk in plans:
                bq = 1 << int(np.ceil(np.log2(max(len(idx), 1))))
                r_sub = np.zeros((bq, s_slots), np.int32)
                a_sub = np.zeros((bq, s_slots), np.float32)
                r_sub[: len(idx)] = rows[idx]
                a_sub[: len(idx)] = coeff[idx]
                buckets.append(
                    (jnp.asarray(r_sub), jnp.asarray(a_sub), nb, blk, len(idx))
                )
            log(
                f"block={blocksize or 'mixed'} buckets: "
                + ", ".join(
                    f"{n}q@{nb}x{blk}" for _, _, nb, blk, n in buckets
                )
            )
            meta = [(b[2], b[3]) for b in buckets]

            rank_pallas = os.environ.get("BENCH_RANK", "xla") == "pallas"

            @jax.jit
            def fused(pr, ip, rs, cs):
                # all buckets inside one XLA program: one dispatch/batch
                outs = [
                    search_packed_ds(
                        pr, ip, r, a, scale, clip, jnp.int32(0),
                        n_blocks=nb, k=k, n_docs=n_docs, block=blk,
                        use_rank_pallas=rank_pallas,
                    )
                    for (r, a), (nb, blk) in zip(zip(rs, cs), meta)
                ]
                return (
                    jnp.concatenate([o[0] for o in outs], axis=0),
                    jnp.concatenate([o[1] for o in outs], axis=0),
                )

            br = tuple(b[0] for b in buckets)
            bc = tuple(b[1] for b in buckets)
            return lambda r, c: fused(post_rec, indptr_d, br, bc)

        step = make_step(
            None if os.environ.get("BENCH_DS_BLOCK", "") == "" else ds_block
        )
        alt_blocks = [
            None if b.strip() == "mixed" else int(b)
            for b in os.environ.get("BENCH_DS_ALT", "").split(",")
            if b.strip()
        ]
    else:
        step_full = jax.jit(
            lambda ip, pd, pv, r, a: search_packed(
                ip, pd, pv, r, a, scale, clip, jnp.int32(0),
                c_total=c_total, k=k, n_docs=n_docs,
            )
        )
        def step(rows_d, coeff_d):
            return step_full(indptr_d, post_doc, post_val, rows_d, coeff_d)

    t0 = time.perf_counter()
    out = step(rows_d, coeff_d)
    _ = np.asarray(out[1][:1])
    log(f"compile+first step: {time.perf_counter()-t0:.1f}s")
    _ = np.asarray(step(rows_d, coeff_d)[1][:1])

    # Pipelined serving loop: dispatch batch i+1 before reading batch i's
    # results, overlapping device compute with the tunnel's ~35ms
    # dispatch->D2H round-trip latency (real TPU hosts see microseconds).
    depth = int(os.environ.get("BENCH_DEPTH", 2))
    from collections import deque

    t0 = time.perf_counter()
    inflight = deque()
    for _i in range(iters):
        inflight.append(step(rows_d, coeff_d))
        if len(inflight) >= depth:
            _ = np.asarray(inflight.popleft()[1])
    while inflight:
        _ = np.asarray(inflight.popleft()[1])
    dt = time.perf_counter() - t0
    qps = nq * iters / dt
    log(
        f"{iters} iters in {dt:.3f}s -> {qps:,.0f} q/s/chip "
        f"({dt/iters*1e3:.2f} ms/batch of {nq})"
    )

    # optional same-index A/B over alternative block sizes (stderr only)
    if path == "ds":
        for b in alt_blocks:
            stp = make_step(b)
            _ = np.asarray(stp(rows_d, coeff_d)[1][:1])
            _ = np.asarray(stp(rows_d, coeff_d)[1][:1])
            t0 = time.perf_counter()
            inflight = deque()
            for _i in range(iters):
                inflight.append(stp(rows_d, coeff_d))
                if len(inflight) >= depth:
                    _ = np.asarray(inflight.popleft()[1])
            while inflight:
                _ = np.asarray(inflight.popleft()[1])
            dtb = time.perf_counter() - t0
            log(
                f"alt block={b}: {nq*iters/dtb:,.0f} q/s/chip "
                f"({dtb/iters*1e3:.2f} ms/batch)"
            )
    print(
        json.dumps(
            {
                "metric": "queries_per_sec_per_chip",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
