"""Analyzer determinism + hashing tests (SURVEY.md §4 unit tests)."""
import numpy as np

from document_search_engine_tpu.analyze.hashing import TermHasher, fnv1a64
from document_search_engine_tpu.analyze.tokenizer import Tokenizer, tokenize
from document_search_engine_tpu.config import AnalyzerConfig


def test_tokenize_basic():
    assert tokenize("Hello, World! 123") == ["hello", "world", "123"]
    assert tokenize("") == []
    assert tokenize("...!!!") == []
    assert tokenize("a-b_c") == ["a", "b", "c"]


def test_tokenize_config():
    t = Tokenizer(AnalyzerConfig(stopwords=("the", "a"), min_token_len=2))
    assert t("The a quick fox") == ["quick", "fox"]


def test_fnv1a64_known_vectors():
    # Standard FNV-1a 64 test vectors.
    assert fnv1a64("") == 0xCBF29CE484222325
    assert fnv1a64("a") == 0xAF63DC4C8601EC8C
    assert fnv1a64("foobar") == 0x85944171F73967E8


def test_hasher_cache_and_vector():
    h = TermHasher()
    toks = ["foo", "bar", "foo"]
    out = h.hash_tokens(toks)
    assert out.dtype == np.uint64
    assert out[0] == out[2] == fnv1a64("foo")
    assert out[1] == fnv1a64("bar")
    # deterministic across instances
    assert np.array_equal(out, TermHasher().hash_tokens(toks))


def test_hash_no_collisions_on_synth_vocab():
    from document_search_engine_tpu.corpus.synth import make_vocab

    vocab = make_vocab(20000, seed=3)
    hashes = TermHasher().hash_tokens(vocab)
    assert len(np.unique(hashes)) == len(vocab)


def test_query_frontend_fast_matches_slow():
    """Vectorized batched query frontend must be bit-identical to the
    per-query reference, including overflow and unicode fallbacks."""
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine

    docs = synth_corpus(n_docs=80, vocab_size=500, mean_len=40, seed=31)
    queries = synth_queries(docs, n_queries=12, terms_per_query=6, seed=32)
    queries += [
        "",
        "zzz unknown words",
        " ".join(docs[0].split()[:40]),  # overflows max_query_terms=8
        "unicode K elvin café",
    ]
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(
            scoring=ScoringConfig(kind=kind), max_query_terms=8
        )
        eng = SearchEngine(cfg)
        eng.build(docs)
        fast_h, fast_a = eng.frontend.analyze(queries, eng.stats)
        slow_h, slow_a = eng.frontend.analyze_slow(queries, eng.stats)
        np.testing.assert_array_equal(fast_h, slow_h)
        np.testing.assert_array_equal(fast_a, slow_a)
