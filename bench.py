"""Benchmark: batched queries/sec/chip (primary metric, BASELINE.json:2).

Builds a synthetic scale index directly as CSR device arrays (Zipf df
distribution; text analysis is benched separately as build docs/sec on
stderr) and times the production search step — fixed-point scoring +
ranked top-k — end to end on the device, excluding compile (warmup) but
including device sync. Target: >=10k batched queries/sec/chip on an
8M-doc sharded index (BASELINE.json:5); vs_baseline is value/10000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_DOCS (default 1_000_000), BENCH_NQ (256), BENCH_K (10),
BENCH_ITERS (10), BENCH_KIND (bm25).
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


def make_synth_csr(n_docs: int, vocab: int, avg_terms: int, seed: int = 0):
    """Synthetic CSR term-document matrix with Zipf document frequencies."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    nnz_target = n_docs * avg_terms
    df = np.maximum(1, (probs * nnz_target).astype(np.int64))
    df = np.minimum(df, n_docs)
    nnz = int(df.sum())
    indptr = np.zeros(vocab + 1, np.int64)
    np.cumsum(df, out=indptr[1:])
    log(f"synth index: {n_docs} docs, {vocab} terms, nnz={nnz/1e6:.1f}M")
    # postings: sorted doc ids per term without replacement is expensive;
    # sample with replacement then dedupe-free approximation: random sorted
    # draws (duplicates possible but rare for df << n_docs; fine for perf).
    post_doc = np.empty(nnz, np.int32)
    post_val = rng.random(nnz, dtype=np.float32) * 0.9 + 0.05
    step = 8_000_000
    for t0 in range(0, nnz, step):
        t1 = min(t0 + step, nnz)
        post_doc[t0:t1] = rng.integers(0, n_docs, t1 - t0, dtype=np.int32)
    # sort within each row by doc id (vectorized: global sort of row-keyed)
    row_of = np.repeat(np.arange(vocab, dtype=np.int64), df)
    order = np.lexsort((post_doc, row_of))
    post_doc = post_doc[order]
    return indptr.astype(np.int32), post_doc, post_val, df


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    nq = int(os.environ.get("BENCH_NQ", 256))
    k = int(os.environ.get("BENCH_K", 10))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    kind = os.environ.get("BENCH_KIND", "bm25")
    vocab = max(50_000, n_docs // 5)
    avg_terms = 60

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.index.csr import round_up
    from document_search_engine_tpu.ops.packed import search_packed, total_cap
    from document_search_engine_tpu.oracle import spec

    log(f"platform: {jax.devices()[0].platform} x{len(jax.devices())}")
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))

    indptr, post_doc, post_val, df = make_synth_csr(
        n_docs, vocab, avg_terms, seed=1
    )
    d_pad = round_up(n_docs + 1, 128)
    dev = {
        "indptr": jnp.asarray(indptr),
        "post_doc": jnp.asarray(post_doc),
        "post_val": jnp.asarray(post_val),
        "alive": jnp.asarray(
            np.concatenate(
                [np.ones(n_docs, bool), np.zeros(d_pad - n_docs, bool)]
            )
        ),
    }
    gid_cols = jnp.asarray(np.arange(d_pad, dtype=np.int32))

    # queries: S slots over mid-frequency terms (df in [64, 32768]) — the
    # realistic regime; engines drop stopword-frequency terms.
    s_slots = 8
    cap_limit = 32768
    rng = np.random.default_rng(7)
    eligible = np.where((df >= 64) & (df <= cap_limit))[0]
    rows = rng.choice(eligible, size=(nq, s_slots)).astype(np.int32)
    coeff = (rng.random((nq, s_slots)).astype(np.float32) * 2.0 + 0.1)
    c_total = total_cap(indptr, rows, np.ones_like(rows, bool))
    log(
        f"queries: nq={nq} slots={s_slots} packed_budget={c_total} "
        f"(avg postings/query "
        f"{int((indptr[rows+1]-indptr[rows]).sum(1).mean())})"
    )

    scale = jnp.float32(2.0**cfg.scoring.scale_bits)
    clip = jnp.float32(int(spec.quant_clip_max(cfg.max_query_terms)))
    rows_d = jnp.asarray(rows)
    coeff_d = jnp.asarray(coeff)

    # index arrays must be jit *arguments*, not closure constants — the
    # axon remote-compile path ships the HLO (including constants) over
    # HTTP and a closed-over index blows its body-size limit.
    def step(ip, pd, pv, rows_d, coeff_d):
        return search_packed(
            ip, pd, pv, rows_d, coeff_d, scale, clip, jnp.int32(0),
            c_total=c_total, k=k, n_docs=n_docs,
        )

    step_full = jax.jit(step)

    def step_j(rows_d, coeff_d):
        return step_full(
            dev["indptr"], dev["post_doc"], dev["post_val"], rows_d, coeff_d,
        )
    # NB: block_until_ready does not reliably sync on the axon platform —
    # force completion with a device-to-host read (which a serving loop
    # performs anyway to return ids).
    t0 = time.perf_counter()
    out = step_j(rows_d, coeff_d)
    _ = np.asarray(out[1])
    log(f"compile+first step: {time.perf_counter()-t0:.1f}s")
    _ = np.asarray(step_j(rows_d, coeff_d)[1])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_j(rows_d, coeff_d)
        ids = np.asarray(out[1])  # D2H each batch, as serving would
    dt = time.perf_counter() - t0
    qps = nq * iters / dt
    log(
        f"{iters} iters in {dt:.3f}s -> {qps:,.0f} q/s/chip "
        f"({dt/iters*1e3:.2f} ms/batch of {nq})"
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
