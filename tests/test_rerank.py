"""Hybrid dense rerank (BASELINE.json:11): Pallas kernel vs jnp reference,
determinism, and end-to-end engine behavior."""
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.config import IndexConfig, ScoringConfig
from document_search_engine_tpu.corpus.synth import synth_corpus, synth_queries
from document_search_engine_tpu.engine.engine import SearchEngine
from document_search_engine_tpu.ops.rerank import (
    doc_embeddings,
    query_embeddings,
    rerank_dots_pallas,
    rerank_dots_ref,
    rerank_order,
)


def test_pallas_dots_match_reference():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((4, 128)).astype(np.float32)
    c = rng.standard_normal((4, 16, 128)).astype(np.float32)
    got = np.asarray(
        rerank_dots_pallas(jnp.asarray(q), jnp.asarray(c), interpret=True)
    )
    ref = np.asarray(rerank_dots_ref(jnp.asarray(q), jnp.asarray(c)))
    # f32 reduction order differs between the kernel and einsum
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)


def test_doc_embeddings_normalized_and_deterministic():
    term_hash = np.array([11, 222, 3333, 44444], np.uint64)
    indptr = np.array([0, 2, 3, 5, 6], np.int32)
    post_doc = np.array([0, 1, 1, 0, 2, 2], np.int32)
    post_val = np.array([0.5, 0.2, 0.7, 0.1, 0.3, 0.9], np.float32)
    e1 = doc_embeddings(term_hash, indptr, post_doc, post_val, 3, 64)
    e2 = doc_embeddings(term_hash, indptr, post_doc, post_val, 3, 64)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_allclose(
        np.linalg.norm(e1, axis=1), np.ones(3), rtol=1e-5
    )


def test_rerank_order_ranking_rules():
    dots = np.array([[0.9, 0.9, 0.1, 0.5]], np.float32)
    lex = np.array([[5, 7, 9, -1]], np.int64)
    gids = np.array([[30, 20, 10, 40]], np.int64)
    ids, ri, lx = rerank_order(dots, lex, gids, k=4)
    # equal rerank 0.9: higher lexical wins -> gid 20 before 30;
    # dead candidate sinks
    assert list(ids[0]) == [20, 30, 10, -1]
    assert lx[0, 0] == 7 and lx[0, 1] == 5
    assert ri[0, 3] == -1


def test_engine_search_rerank_end_to_end():
    docs = synth_corpus(n_docs=80, vocab_size=400, mean_len=30, seed=17)
    queries = synth_queries(docs, n_queries=6, seed=18)
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    eng.build(docs)
    lex_ids, lex_scores = eng.search(queries, k=10)
    ids, ri, lx = eng.search_rerank(queries, k=10, candidates=32)
    assert ids.shape == (6, 10)
    # reranked set is drawn from the lexical candidate pool
    pool_ids, _ = eng.search(queries, k=32)
    for row in range(6):
        got = set(i for i in ids[row].tolist() if i >= 0)
        pool = set(i for i in pool_ids[row].tolist() if i >= 0)
        assert got <= pool
    # deterministic across calls (cache warm + cold)
    ids2, ri2, _ = eng.search_rerank(queries, k=10, candidates=32)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(ri, ri2)
    # incremental update invalidates embeddings without breaking rerank
    eng.add_docs(docs[:3])
    ids3, _, _ = eng.search_rerank(queries, k=10, candidates=32)
    assert ids3.shape == (6, 10)
