"""Native C analyzer must be bit-identical to the Python reference
(SURVEY.md §4 analyzer determinism; native/analyzer.cpp contract)."""
import numpy as np
import pytest

from document_search_engine_tpu.analyze import native
from document_search_engine_tpu.config import AnalyzerConfig, IndexConfig
from document_search_engine_tpu.corpus.synth import synth_corpus
from document_search_engine_tpu.index import builder

needs_native = pytest.mark.skipif(
    not native.available(), reason="native lib not built (make -C native)"
)


def assert_analyzed_equal(a, b):
    np.testing.assert_array_equal(a.hashes, b.hashes)
    np.testing.assert_array_equal(a.tfs, b.tfs)
    np.testing.assert_array_equal(a.doc_ptr, b.doc_ptr)
    np.testing.assert_array_equal(a.dl, b.dl)


@needs_native
def test_fast_analyze_matches_python_ascii():
    docs = synth_corpus(n_docs=60, vocab_size=300, mean_len=30, seed=13)
    docs += ["", "UPPER lower MiXeD 123 a" , "x" * 100, "a-b_c..d!!e"]
    cfg = IndexConfig()
    ref = builder.analyze_texts(docs, cfg)
    fast = builder.analyze_texts_fast(docs, cfg)
    assert_analyzed_equal(fast, ref)


@needs_native
def test_fast_analyze_matches_python_mixed_unicode():
    docs = [
        "plain ascii doc",
        "unicode K elvin and İstanbul stuff",  # K -> k, İ edge
        "café naïve résumé",
        "ascii again 42",
        "中文 tokens mixed ascii42",
    ]
    cfg = IndexConfig()
    ref = builder.analyze_texts(docs, cfg)
    fast = builder.analyze_texts_fast(docs, cfg)
    assert_analyzed_equal(fast, ref)


@needs_native
def test_fast_analyze_token_length_filter():
    cfg = IndexConfig(
        analyzer=AnalyzerConfig(min_token_len=2, max_token_len=5)
    )
    docs = ["a bb ccc dddddd eee", "x yy"]
    ref = builder.analyze_texts(docs, cfg)
    fast = builder.analyze_texts_fast(docs, cfg)
    assert_analyzed_equal(fast, ref)


def test_fast_analyze_falls_back_without_support():
    cfg = IndexConfig(analyzer=AnalyzerConfig(stopwords=("the",)))
    docs = ["the quick fox", "the lazy dog"]
    ref = builder.analyze_texts(docs, cfg)
    fast = builder.analyze_texts_fast(docs, cfg)  # python fallback path
    assert_analyzed_equal(fast, ref)
