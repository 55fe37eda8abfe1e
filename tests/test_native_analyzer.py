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


@needs_native
def test_query_slots_matches_numpy_batch_path():
    """The one-pass C frontend (dse_query_slots: lookup + slot assembly
    + f32 coeff math) must be bit-identical — including the f32 coeff
    BITS — to the vectorized numpy path it replaces, across scorings,
    df=0 rows, unknown terms, empty queries, duplicate terms, and
    slot-overflow queries."""
    from document_search_engine_tpu.analyze.hashing import TermHasher
    from document_search_engine_tpu.config import ScoringConfig
    from document_search_engine_tpu.engine.query import QueryFrontend
    from document_search_engine_tpu.index.csr import GlobalStats

    if not native.slots_available():
        pytest.skip("committed .so predates dse_query_slots")
    rng = np.random.default_rng(5)
    V = 6000
    tokens = [f"tok{i:05d}" for i in range(V)]
    vocab = np.sort(TermHasher().hash_tokens(tokens))
    df = rng.integers(0, 500, V).astype(np.int32)  # includes df=0 rows
    qrows = rng.integers(0, V, (64, 6))
    batch = [" ".join(tokens[r] for r in qr) for qr in qrows]
    batch += [
        "",
        "zzzz unknown terms",
        "tok00001 tok00001 tok00002",
        " ".join(tokens[:40]),  # overflow: > max_query_terms uniques
    ]
    for kind in ("bm25", "tfidf"):
        stats = GlobalStats(
            vocab=vocab, df=df, n_alive=9000, total_len_alive=270000
        )
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        fe = QueryFrontend(cfg)
        fast = fe.analyze_rows(batch, stats)
        orig = native.slots_available
        native.slots_available = lambda: False
        try:
            ref = fe.analyze_rows(batch, stats)
        finally:
            native.slots_available = orig
        for a, b, name in zip(fast, ref, ("h", "a", "rows", "found")):
            if name == "a":
                np.testing.assert_array_equal(
                    a.view(np.uint32), b.view(np.uint32), f"{kind}/{name}"
                )
            else:
                np.testing.assert_array_equal(a, b, f"{kind}/{name}")


@needs_native
def test_analyze_queries_fused_matches_fallback_paths():
    """The fully-fused text->slots C pass (dse_analyze_queries) must be
    bit-identical to BOTH fallback paths (two-call native, numpy batch)
    including f32 coeff bits, and non-ASCII batches must route around
    it and still match."""
    from document_search_engine_tpu.analyze.hashing import TermHasher
    from document_search_engine_tpu.config import ScoringConfig
    from document_search_engine_tpu.engine.query import QueryFrontend
    from document_search_engine_tpu.index.csr import GlobalStats

    if not native.analyze_queries_available():
        pytest.skip("committed .so predates dse_analyze_queries")
    rng = np.random.default_rng(17)
    V = 5000
    tokens = [f"tok{i:05d}" for i in range(V)]
    vocab = np.sort(TermHasher().hash_tokens(tokens))
    df = rng.integers(0, 400, V).astype(np.int32)
    qrows = rng.integers(0, V, (48, 6))
    batch = [" ".join(tokens[r] for r in qr) for qr in qrows]
    batch += [
        "",
        "zzzz unknown",
        "tok00001 tok00001 tok00002",
        " ".join(tokens[:40]),  # overflow
        "UPPER Case MiXeD tok00007",
    ]
    uni = list(batch) + ["café naïve tok00003"]  # non-ASCII batch
    for kind in ("bm25", "tfidf"):
        stats = GlobalStats(
            vocab=vocab, df=df, n_alive=8000, total_len_alive=240000
        )
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        fe = QueryFrontend(cfg)
        for queries in (batch, uni):
            fused = fe.analyze_rows(queries, stats)
            orig_aq = native.analyze_queries_available
            native.analyze_queries_available = lambda: False
            try:
                twocall = fe.analyze_rows(queries, stats)
                orig_qs = native.slots_available
                native.slots_available = lambda: False
                try:
                    ref = fe.analyze_rows(queries, stats)
                finally:
                    native.slots_available = orig_qs
            finally:
                native.analyze_queries_available = orig_aq
            for got, name in ((twocall, "two-call"), (ref, "numpy")):
                for a, b, f in zip(fused, got, ("h", "a", "r", "f")):
                    if f == "a":
                        np.testing.assert_array_equal(
                            a.view(np.uint32), b.view(np.uint32),
                            f"{kind}/{name}/{f}",
                        )
                    else:
                        np.testing.assert_array_equal(
                            a, b, f"{kind}/{name}/{f}"
                        )


@needs_native
def test_analyze_queries_hash_matches_prefix_path():
    """The flat hash-table frontend (dse_hash_build +
    dse_analyze_queries_hash) must be bit-identical to the prefix-table
    fused pass on the same batches — same slots, rows, found masks and
    f32 coeff bits — including unknown terms, repeats, empties and
    slot-overflow rows."""
    from document_search_engine_tpu.analyze.hashing import TermHasher
    from document_search_engine_tpu.config import ScoringConfig
    from document_search_engine_tpu.engine.query import QueryFrontend
    from document_search_engine_tpu.index.csr import GlobalStats

    if not native.hash_lookup_available():
        pytest.skip("committed .so predates dse_hash_build")
    rng = np.random.default_rng(23)
    V = 7000
    tokens = [f"term{i:05d}" for i in range(V)]
    vocab = np.sort(TermHasher().hash_tokens(tokens))
    df = rng.integers(0, 900, V).astype(np.int32)
    qrows = rng.integers(0, V, (64, 5))
    batch = [" ".join(tokens[r] for r in qr) for qr in qrows]
    batch += [
        "",
        "unknownword anotherunknown",
        "term00004 term00004 term00004 term00009",
        " ".join(tokens[100:150]),  # overflow
    ]
    for kind in ("bm25", "tfidf"):
        stats = GlobalStats(
            vocab=vocab, df=df, n_alive=9000, total_len_alive=300000
        )
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        fe = QueryFrontend(cfg)
        got = fe.analyze_rows(batch, stats)  # hash path
        orig = native.hash_lookup_available
        native.hash_lookup_available = lambda: False
        try:
            ref = fe.analyze_rows(batch, stats)  # prefix-fused path
        finally:
            native.hash_lookup_available = orig
        for a, b, f in zip(got, ref, ("h", "a", "r", "f")):
            if f == "a":
                np.testing.assert_array_equal(
                    a.view(np.uint32), b.view(np.uint32), f"{kind}/{f}"
                )
            else:
                np.testing.assert_array_equal(a, b, f"{kind}/{f}")


@needs_native
def test_unique_inverse_matches_numpy():
    """native.unique_inverse must equal np.unique(return_inverse=True)
    exactly — sorted vocab and per-value rows — across duplicate-heavy,
    near-unique, tiny and grow-path (load > half table) distributions."""
    if not native.hash_lookup_available():
        pytest.skip("committed .so predates dse_hash_unique")
    rng = np.random.default_rng(29)
    cases = [(120000, 9000), (70000, 70000), (4096, 17), (100000, 100000)]
    for n, pool in cases:
        vals = rng.integers(0, 2**64, pool, dtype=np.uint64)[
            rng.integers(0, pool, n)
        ]
        v1, r1, c1 = native.unique_inverse(vals, counts=True)
        v2, r2, c2 = np.unique(
            vals, return_inverse=True, return_counts=True
        )
        np.testing.assert_array_equal(v1, v2, f"vocab n={n} pool={pool}")
        np.testing.assert_array_equal(
            r1, r2.astype(np.int32), f"rows n={n} pool={pool}"
        )
        np.testing.assert_array_equal(
            c1, c2.astype(np.int32), f"counts n={n} pool={pool}"
        )
    v1, r1 = native.unique_inverse(np.zeros(0, np.uint64))
    assert len(v1) == 0 and len(r1) == 0


@needs_native
def test_threaded_paths_match_serial():
    """The threaded doc-analysis (dse_analyze_docs_mt: token-balanced
    ranges + compaction) and threaded query frontend must be
    bit-identical to the serial path at every thread count, including
    empty docs and uneven splits."""
    import os

    from document_search_engine_tpu.analyze.hashing import TermHasher

    if not hasattr(native._lib(), "dse_analyze_docs_mt"):
        pytest.skip("committed .so predates dse_analyze_docs_mt")
    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(1500)]
    texts = [
        " ".join(rng.choice(words, rng.integers(0, 50)).tolist())
        for _ in range(1200)
    ] + ["", "   ", "a b a b a"]
    cfgA = IndexConfig().analyzer
    vocab = np.sort(TermHasher().hash_tokens(words))
    idf = rng.random(len(vocab)).astype(np.float32)
    tb, lg = native.hash_build(vocab, idf)
    queries = [
        " ".join(rng.choice(words, rng.integers(1, 6)).tolist())
        for _ in range(1500)
    ]
    saved = os.environ.get("DSE_NATIVE_THREADS")
    try:
        ref_d = ref_q = None
        for t in ("1", "2", "3", "16"):
            os.environ["DSE_NATIVE_THREADS"] = t
            d = native.analyze_batch_ascii(texts, cfgA)
            q = native.analyze_queries_hash(queries, cfgA, tb, lg, 8, "bm25")
            if ref_d is None:
                ref_d, ref_q = d, q
                continue
            for a, b in zip(ref_d, d):
                np.testing.assert_array_equal(a, b, f"docs threads={t}")
            for a, b in zip(ref_q, q):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), f"queries threads={t}"
                )
    finally:
        if saved is None:
            os.environ.pop("DSE_NATIVE_THREADS", None)
        else:
            os.environ["DSE_NATIVE_THREADS"] = saved
