"""Topic-corpus quality gate (the offline stand-in for the 20 Newsgroups
recall@10 / MAP parity config, BASELINE.json:8): engine metrics must equal
oracle metrics exactly (rankings bit-identical) and clear a sanity floor,
for both tfidf and bm25."""
import pytest

from document_search_engine_tpu.config import IndexConfig, ScoringConfig
from document_search_engine_tpu.engine.engine import SearchEngine
from document_search_engine_tpu.eval.harness import (
    parity_report,
    topic_corpus,
    topic_queries,
)
from document_search_engine_tpu.oracle import OracleEngine


@pytest.mark.parametrize("kind", ["tfidf", "bm25"])
def test_topic_eval_parity_and_quality(kind):
    docs, doc_topics, topics = topic_corpus(
        n_topics=5, docs_per_topic=20, seed=3
    )
    queries, q_topics = topic_queries(topics, n_per_topic=4)
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    eng = SearchEngine(cfg)
    eng.build(docs)
    ora = OracleEngine(cfg)
    ora.build(docs)
    rep = parity_report(eng, ora, queries, q_topics, doc_topics)
    assert rep["ranking_agreement"] == 1.0, rep
    assert rep["engine"] == rep["oracle"], rep
    # topic queries should retrieve their own topic's docs well
    assert rep["engine"]["recall@10"] > 0.4, rep
    assert rep["engine"]["map"] > 0.4, rep
    # the hybrid rerank must not wreck topical quality (BASELINE.json:11)
    from document_search_engine_tpu.eval.harness import evaluate

    rr = evaluate(eng, queries, q_topics, doc_topics, rerank=True)
    assert rr["recall@10"] > 0.4, rr
    assert rr["map"] > 0.3, rr
