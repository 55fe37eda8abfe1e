"""THE parity gate (BASELINE.json:5): engine top-k bit-identical to the
frozen CPU oracle — ids AND integer scores — on the toy corpus, for both
tfidf and bm25, including after incremental add/delete."""
import numpy as np
import pytest

from document_search_engine_tpu.config import IndexConfig, ScoringConfig
from document_search_engine_tpu.corpus.synth import synth_corpus, synth_queries
from document_search_engine_tpu.engine.engine import SearchEngine
from document_search_engine_tpu.oracle import OracleEngine


def _toy(seed=0, n_docs=120):
    docs = synth_corpus(
        n_docs=n_docs, vocab_size=800, mean_len=40, seed=seed
    )
    queries = synth_queries(docs, n_queries=17, terms_per_query=5, seed=seed + 1)
    queries += ["", "zzznotaword", docs[0].split()[0]]
    return docs, queries


def assert_bit_identical(engine, oracle, queries, k=10):
    e_ids, e_scores = engine.search(queries, k=k)
    o_ids, o_scores = oracle.search(queries, k=k)
    np.testing.assert_array_equal(e_ids, o_ids)
    np.testing.assert_array_equal(e_scores, o_scores)


@pytest.mark.parametrize("kind", ["tfidf", "bm25"])
def test_parity_toy_corpus(kind):
    docs, queries = _toy()
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    eng = SearchEngine(cfg)
    eng.build(docs)
    ora = OracleEngine(cfg)
    ora.build(docs)
    assert_bit_identical(eng, ora, queries)


@pytest.mark.parametrize("kind", ["tfidf", "bm25"])
def test_parity_duplicate_docs_ties(kind):
    docs = ["same exact words"] * 5 + ["different thing entirely"]
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    eng = SearchEngine(cfg)
    eng.build(docs)
    ora = OracleEngine(cfg)
    ora.build(docs)
    assert_bit_identical(eng, ora, ["same words", "different"], k=6)


@pytest.mark.parametrize("kind", ["tfidf", "bm25"])
def test_vector_oracle_matches_dict_oracle(kind):
    """The vectorized oracle must equal the dict oracle bit-for-bit,
    including after add/delete — it is the scale stand-in for the same
    frozen reference semantics."""
    from document_search_engine_tpu.oracle import VectorOracleEngine

    docs, queries = _toy(seed=9, n_docs=90)
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    d_o, v_o = OracleEngine(cfg), VectorOracleEngine(cfg)
    d_o.build(docs)
    v_o.build(docs)
    for step in range(3):
        di, ds = d_o.search(queries, k=10)
        vi, vs = v_o.search(queries, k=10)
        np.testing.assert_array_equal(vi, di, f"step {step}")
        np.testing.assert_array_equal(vs, ds, f"step {step}")
        d_o.delete_docs([step * 7, step * 11 + 1])
        v_o.delete_docs([step * 7, step * 11 + 1])
        d_o.add_docs(docs[step : step + 2])
        v_o.add_docs(docs[step : step + 2])


@pytest.mark.parametrize("kind", ["tfidf", "bm25"])
def test_parity_at_scale(kind):
    """The parity gate at a 20-Newsgroups-scale corpus (~12k docs,
    BASELINE.json:8): engine vs the vectorized oracle, bit-identical
    ids AND integer scores."""
    from document_search_engine_tpu.oracle import VectorOracleEngine

    docs = synth_corpus(n_docs=12000, vocab_size=9000, mean_len=60, seed=6)
    queries = synth_queries(docs, n_queries=24, terms_per_query=5, seed=7)
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    eng = SearchEngine(cfg)
    eng.build(docs)
    ora = VectorOracleEngine(cfg)
    ora.build(docs)
    assert_bit_identical(eng, ora, queries)


@pytest.mark.parametrize("kind", ["tfidf", "bm25"])
def test_parity_incremental_add_delete(kind):
    docs, queries = _toy(seed=4, n_docs=60)
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    eng = SearchEngine(cfg)
    ora = OracleEngine(cfg)
    eng.build(docs[:40])
    ora.build(docs[:40])
    assert_bit_identical(eng, ora, queries)
    # add a second segment
    eng.add_docs(docs[40:])
    ora.add_docs(docs[40:])
    assert_bit_identical(eng, ora, queries)
    # delete some docs across both segments
    eng.delete_docs([0, 5, 45, 59])
    ora.delete_docs([0, 5, 45, 59])
    assert_bit_identical(eng, ora, queries)


def test_parity_k_larger_than_corpus():
    docs = ["alpha beta", "beta gamma", "delta epsilon"]
    eng = SearchEngine()
    eng.build(docs)
    ora = OracleEngine()
    ora.build(docs)
    assert_bit_identical(eng, ora, ["beta", "zeta"], k=8)


def test_parity_query_overflowing_slots():
    docs, _ = _toy(seed=9, n_docs=50)
    cfg = IndexConfig(max_query_terms=4)
    eng = SearchEngine(cfg)
    eng.build(docs)
    ora = OracleEngine(cfg)
    ora.build(docs)
    # query with many more unique terms than slots
    big_q = " ".join(docs[3].split()[:20])
    assert_bit_identical(eng, ora, [big_q], k=10)
