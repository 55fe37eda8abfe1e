"""TPU-hardware smoke tests — skipped under the CPU test backend.

Run manually on the real chip:
    DSE_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
(the env flag stops conftest from forcing the CPU backend). Validates the
two hardware contracts
the suite can't check on CPU: lax.top_k tie stability on TPU, and engine
parity vs the oracle executed on the actual device.
"""
import jax
import numpy as np
import pytest

on_tpu = any(d.platform == "tpu" for d in jax.devices())
needs_tpu = pytest.mark.skipif(not on_tpu, reason="no TPU in this backend")


@needs_tpu
def test_topk_tie_stability_on_tpu():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.integers(0, 5, size=(4, 4096)).astype(np.int32)
    _, idx = jax.lax.top_k(jnp.asarray(x), 50)
    idx = np.asarray(idx)
    for r in range(4):
        expect = np.lexsort((np.arange(4096), -x[r]))[:50]
        np.testing.assert_array_equal(idx[r], expect)


@needs_tpu
def test_engine_oracle_parity_on_tpu():
    """Every scorer mode — the fused Pallas kernel (TPU production), the
    XLA plan-table twin, and XLA + Pallas rank kernel — must match the
    oracle bit-for-bit ON HARDWARE (compiled Mosaic, not interpret)."""
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine
    from document_search_engine_tpu.oracle import OracleEngine

    docs = synth_corpus(n_docs=120, vocab_size=700, mean_len=40, seed=77)
    queries = synth_queries(docs, n_queries=8, seed=78) + ["", "zzz"]
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        eng = SearchEngine(cfg)
        eng.build(docs)
        ora = OracleEngine(cfg)
        ora.build(docs)
        oi, os_ = ora.search(queries, k=10)
        for mode in ("fused", "fused_dv", "xla", "xla_rank"):
            eng.scorer = mode
            ei, es = eng.search(queries, k=10)
            np.testing.assert_array_equal(ei, oi, f"{kind}/{mode}")
            np.testing.assert_array_equal(es, os_, f"{kind}/{mode}")
        # incremental updates (device O(delta) refresh + multi-segment
        # fused search) must hold parity on hardware too
        eng.scorer = "fused"
        eng.delete_docs([2, 50])
        ora.delete_docs([2, 50])
        eng.add_docs(docs[:3])
        ora.add_docs(docs[:3])
        ei, es = eng.search(queries, k=10)
        oi, os_ = ora.search(queries, k=10)
        np.testing.assert_array_equal(ei, oi, f"{kind}/incremental")
        np.testing.assert_array_equal(es, os_, f"{kind}/incremental")


@needs_tpu
def test_merge_flip_and_split_parity_on_tpu():
    """The two round-4 rank levers — MERGE_FLIP (flip-first merge
    network) and doc-range splitting — must hold oracle bit-identity in
    compiled Mosaic on the real chip (they were pinned on CPU while the
    tunnel was down; this is the hardware gate)."""
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine
    from document_search_engine_tpu.oracle import OracleEngine
    from document_search_engine_tpu.ops import rank_pallas as rp

    docs = synth_corpus(n_docs=140, vocab_size=600, mean_len=40, seed=101)
    queries = synth_queries(docs, n_queries=8, seed=102) + ["", "zzz"]
    saved = rp.MERGE_FLIP
    try:
        for kind in ("tfidf", "bm25"):
            cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
            ora = OracleEngine(cfg)
            ora.build(docs)
            oi, os_ = ora.search(queries, k=10)
            for flip, split in ((True, None), (False, 2), (True, 2)):
                rp.MERGE_FLIP = flip
                # MERGE_FLIP is a trace-time global and _batch_step is a
                # module-level jit keyed only on shapes/statics: without
                # clearing, the (flip=True, split=2) combo would reuse
                # the executable compiled for (flip=False, split=2) and
                # never exercise the flip network (ADVICE round 4; same
                # hazard documented in test_rank_pallas.py).
                jax.clear_caches()
                eng = SearchEngine(cfg)
                eng.build(docs)
                eng.scorer = "fused"
                eng.split_rows = split
                ei, es = eng.search(queries, k=10)
                tag = f"{kind}/flip={flip}/split={split}"
                np.testing.assert_array_equal(ei, oi, tag)
                np.testing.assert_array_equal(es, os_, tag)
    finally:
        rp.MERGE_FLIP = saved


@needs_tpu
def test_exact_div_on_tpu():
    """TPU f32 divide is reciprocal-based (~35% of quotients 1 ulp off
    numpy); builder.exact_div's residual correction must restore IEEE
    rounding — it feeds every on-device bm25 value materialization."""
    import jax.numpy as jnp

    from document_search_engine_tpu.index.builder import exact_div

    rng = np.random.default_rng(11)
    n = 1 << 20
    tf = rng.integers(1, 2000, n).astype(np.float32)
    kd = (rng.random(n).astype(np.float32) * 5 + 0.1).astype(np.float32)
    num, den = tf * np.float32(2.5), tf + kd
    got = np.asarray(jax.jit(exact_div)(jnp.asarray(num), jnp.asarray(den)))
    np.testing.assert_array_equal(got, num / den)


@needs_tpu
def test_rank_kernel_matches_xla_on_tpu():
    """Compiled (non-interpret) rank kernel == XLA rank tail on device."""
    import jax.numpy as jnp

    from document_search_engine_tpu.ops.packed import rank_candidates
    from document_search_engine_tpu.ops.rank_pallas import (
        rank_candidates_pallas,
    )

    rng = np.random.default_rng(17)
    nq, n_blocks, block, s, n_docs = 4, 8, 256, 8, 500
    c = n_blocks * block
    d = np.full((nq, c), n_docs, np.int32)
    ci = np.zeros((nq, c), np.int32)
    for q in range(nq):
        for b in range(n_blocks):
            n = int(rng.integers(0, block * 7 // 10))
            docs = np.sort(
                rng.choice(n_docs, size=n, replace=False).astype(np.int32)
            )
            d[q, b * block : b * block + n] = docs
            ci[q, b * block : b * block + n] = rng.integers(
                0, 50, n
            ).astype(np.int32)
    for k in (10, 64):  # k=10: extraction path; k=64: bitonic top-128
        ref = rank_candidates(
            jnp.asarray(d), jnp.asarray(ci), jnp.int32(7), s, k, n_docs
        )
        got = rank_candidates_pallas(
            jnp.asarray(d), jnp.asarray(ci), jnp.int32(7),
            block=block, s=s, k=k, n_docs=n_docs,
        )
        np.testing.assert_array_equal(
            np.asarray(got[0]), np.asarray(ref[0]), f"k={k}"
        )
        np.testing.assert_array_equal(
            np.asarray(got[1]), np.asarray(ref[1]), f"k={k}"
        )


@needs_tpu
def test_rerank_on_tpu():
    """Hybrid rerank end-to-end on hardware: device int8 embedding
    build, candidate gather + MXU dots, bitonic large-k candidate gen —
    deterministic and drawn from the lexical pool."""
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine

    docs = synth_corpus(n_docs=100, vocab_size=500, mean_len=30, seed=91)
    queries = synth_queries(docs, n_queries=5, seed=92)
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    eng.build(docs)
    ids, ri, lx = eng.search_rerank(queries, k=10, candidates=32)
    ids2, ri2, _ = eng.search_rerank(queries, k=10, candidates=32)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(ri, ri2)
    pool_ids, _ = eng.search(queries, k=32)
    for row in range(len(queries)):
        got = set(i for i in ids[row].tolist() if i >= 0)
        pool = set(i for i in pool_ids[row].tolist() if i >= 0)
        assert got <= pool


@needs_tpu
def test_sharded_step_on_tpu():
    """The SPMD sharded step (1-device TPU mesh, fused kernel inside
    shard_map) must match the single-process engine bit-for-bit on the
    real chip."""
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine
    from document_search_engine_tpu.parallel.dist import (
        DistributedSearchEngine,
    )
    from document_search_engine_tpu.parallel.mesh import make_mesh

    docs = synth_corpus(n_docs=90, vocab_size=500, mean_len=30, seed=81)
    queries = synth_queries(docs, n_queries=6, seed=82)
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    single = SearchEngine(cfg)
    single.build(docs)
    dist = DistributedSearchEngine(cfg, mesh=make_mesh(1))
    dist.build(docs)
    assert dist.scorer_mode == "fused"
    si, ss = single.search(queries, k=10)
    di, ds = dist.search(queries, k=10)
    np.testing.assert_array_equal(di, si)
    np.testing.assert_array_equal(ds, ss)
    # SPMD rerank (per-shard MXU dots + integer psum) on the real chip
    s_ids, s_ri, s_lex = single.search_rerank(queries, k=8, candidates=24)
    d_ids, d_ri, d_lex = dist.search_rerank(queries, k=8, candidates=24)
    np.testing.assert_array_equal(d_ids, s_ids)
    np.testing.assert_array_equal(d_ri, s_ri)
    np.testing.assert_array_equal(d_lex, s_lex)
