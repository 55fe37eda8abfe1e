"""Index build unit tests: CSR pack round-trip, host/device pack equality
(SURVEY.md §4 "CSR pack round-trip")."""
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.config import IndexConfig
from document_search_engine_tpu.index import builder
from document_search_engine_tpu.index.csr import merge_stats


def test_analyze_texts_shapes():
    a = builder.analyze_texts(["b a a c", "c c", ""], IndexConfig())
    assert a.n_docs == 3
    assert list(a.dl) == [4, 2, 0]
    assert list(np.diff(a.doc_ptr)) == [3, 1, 0]
    # per-doc hashes sorted ascending
    assert np.all(np.diff(a.hashes[:3].astype(np.int64)) >= 0) or np.all(
        np.diff(a.hashes[:3]) >= 0
    )


def test_host_device_pack_equal():
    rng = np.random.default_rng(0)
    n_terms, n_docs, nnz = 50, 30, 400
    rows = rng.integers(0, n_terms, nnz).astype(np.int32)
    docs = rng.integers(0, n_docs, nnz).astype(np.int32)
    tfs = rng.integers(1, 5, nnz).astype(np.int32)
    # dedupe (row, doc) pairs as the analyzer guarantees
    _, uniq = np.unique(rows.astype(np.int64) * n_docs + docs, return_index=True)
    rows, docs, tfs = rows[uniq], docs[uniq], tfs[uniq]

    hr, hd, ht, hip = builder.host_pack(rows, docs, tfs, n_terms, n_docs)
    dr, dd, dt, dip, ddf, ddl = builder.device_pack(
        jnp.asarray(rows), jnp.asarray(docs), jnp.asarray(tfs),
        n_terms=n_terms, n_docs=n_docs,
    )
    np.testing.assert_array_equal(hr, np.asarray(dr))
    np.testing.assert_array_equal(hd, np.asarray(dd))
    np.testing.assert_array_equal(ht, np.asarray(dt))
    np.testing.assert_array_equal(hip, np.asarray(dip))
    np.testing.assert_array_equal(
        np.asarray(ddf), np.bincount(rows, minlength=n_terms)
    )
    dl_exp = np.zeros(n_docs, np.int64)
    np.add.at(dl_exp, docs, tfs)
    np.testing.assert_array_equal(np.asarray(ddl), dl_exp)


def test_build_segment_csr_roundtrip():
    texts = ["a b b c", "b d", "e"]
    cfg = IndexConfig()
    analyzed = builder.analyze_texts(texts, cfg)
    host, dev = builder.build_segment(analyzed, cfg)
    assert host.n_docs == 3
    T = host.n_terms
    indptr = np.asarray(dev.indptr)
    row_start = np.asarray(dev.row_start)
    post_doc = np.asarray(dev.post_doc).reshape(-1)
    post_tf = np.asarray(dev.post_tf).reshape(-1)
    # reconstruct dense matrix and check tf counts (aligned layout:
    # row r's postings live at row_start[r] + [0, len_r))
    dense = np.zeros((T, 3))
    for t in range(T):
        for i in range(indptr[t + 1] - indptr[t]):
            p = row_start[t] + i
            dense[t, post_doc[p]] = post_tf[p]
    assert dense.sum() == 4 + 2 + 1
    # df from CSR matches host df
    df_csr = np.diff(indptr)
    np.testing.assert_array_equal(df_csr, host.df)
    # doc 0 has term 'b' with tf 2
    hasher_row = np.searchsorted(
        host.term_hash,
        np.uint64(
            __import__(
                "document_search_engine_tpu.analyze.hashing",
                fromlist=["fnv1a64"],
            ).fnv1a64("b")
        ),
    )
    assert dense[hasher_row, 0] == 2
    assert dense[hasher_row, 1] == 1


def test_device_build_matches_host_build():
    """Device-side segment build (jit CSR pack + on-device value
    materialization) must produce a bit-identical index and identical
    search results vs the host build, for both scoring kinds, including
    after incremental add/delete (device O(delta) refresh vs host)."""
    from document_search_engine_tpu.config import ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine

    docs = synth_corpus(n_docs=70, vocab_size=300, mean_len=25, seed=31)
    queries = synth_queries(docs, n_queries=8, terms_per_query=4, seed=32)
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        dev_e, host_e = SearchEngine(cfg), SearchEngine(cfg)
        dev_e.device_build, host_e.device_build = True, False
        dev_e.build(docs)
        host_e.build(docs)
        dh, dd = dev_e.segments[0]
        hh, hd = host_e.segments[0]
        np.testing.assert_array_equal(dh.indptr, hh.indptr)
        np.testing.assert_array_equal(dh.df, hh.df)
        # device planes/tables are shape-bucketed (builder.shape_bucket,
        # round 5): the true prefix must be bit-identical to the host
        # build and the padded tail pure sentinel/zero
        hx = np.asarray(hd.post_doc).shape[0]
        ddoc, hdoc = np.asarray(dd.post_doc), np.asarray(hd.post_doc)
        np.testing.assert_array_equal(ddoc[:hx], hdoc, kind)
        assert (ddoc[hx:] == dh.n_docs).all(), kind
        dval, hval = np.asarray(dd.post_val), np.asarray(hd.post_val)
        np.testing.assert_array_equal(dval[:hx], hval, kind)
        assert (dval[hx:] == 0).all(), kind
        drs, hrs = np.asarray(dd.row_start), np.asarray(hd.row_start)
        np.testing.assert_array_equal(drs[: dh.n_terms], hrs, kind)
        # padded row_start entries point one-past-the-plane (scatter
        # sink); padded indptr entries repeat the true nnz
        assert (drs[dh.n_terms :] == ddoc.shape[0] * 128).all(), kind
        dip = np.asarray(dd.indptr)
        np.testing.assert_array_equal(dip[: dh.n_terms + 1], dh.indptr)
        assert (dip[dh.n_terms + 1 :] == dh.indptr[-1]).all(), kind
        di, ds = dev_e.search(queries, k=10)
        hi, hs = host_e.search(queries, k=10)
        np.testing.assert_array_equal(di, hi)
        np.testing.assert_array_equal(ds, hs)
        # incremental: device refresh (O(delta)) == host re-materialize
        dev_e.delete_docs([3, 10])
        host_e.delete_docs([3, 10])
        dev_e.add_docs(docs[:5])
        host_e.add_docs(docs[:5])
        di, ds = dev_e.search(queries, k=10)
        hi, hs = host_e.search(queries, k=10)
        np.testing.assert_array_equal(di, hi, kind)
        np.testing.assert_array_equal(ds, hs, kind)
        # compact drops tombstones, results unchanged
        ref = dev_e.search(queries, k=10)
        dev_e.compact()
        after = dev_e.search(queries, k=10)
        np.testing.assert_array_equal(after[0], ref[0])
        np.testing.assert_array_equal(after[1], ref[1])


def test_device_build_checkpoint_roundtrip(tmp_path):
    """A device-built engine (no host postings copies) must checkpoint
    and reload with identical results, and the reloaded engine must
    still support incremental updates (device refresh path)."""
    from document_search_engine_tpu.config import ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine

    docs = synth_corpus(n_docs=40, vocab_size=200, mean_len=20, seed=33)
    queries = synth_queries(docs, n_queries=5, terms_per_query=3, seed=34)
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    eng = SearchEngine(cfg)
    eng.build(docs)
    ref = eng.search(queries, k=10)
    path = str(tmp_path / "devidx")
    eng.save(path)
    re = SearchEngine.load(path)
    got = re.search(queries, k=10)
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])
    re.delete_docs([0])
    eng.delete_docs([0])
    np.testing.assert_array_equal(
        re.search(queries, k=10)[0], eng.search(queries, k=10)[0]
    )


def _stratified_analyzed(n_docs, tpd, vocab, seed):
    """AnalyzedDocs with exactly n_docs*tpd postings and `vocab` terms:
    per doc one term per vocab stratum (hashes ascending per doc)."""
    rng = np.random.default_rng(seed)
    vocab_h = np.unique(
        rng.integers(1, 2**63, vocab * 2, dtype=np.uint64)
    )[:vocab]
    stride = vocab // tpd
    idx = rng.integers(0, stride, (n_docs, tpd)) + np.arange(tpd) * stride
    hashes = vocab_h[idx].ravel()
    tfs = rng.integers(1, 4, n_docs * tpd).astype(np.int32)
    return builder.AnalyzedDocs(
        hashes=hashes,
        tfs=tfs,
        doc_ptr=np.arange(n_docs + 1, dtype=np.int64) * tpd,
        dl=tfs.reshape(n_docs, tpd).sum(1).astype(np.int32),
    )


def test_device_build_shapes_are_bucketed_for_jit_reuse():
    """Streaming/incremental device builds must reuse compiled programs
    across similar-sized batches (round-4 VERDICT #7 enabler): two
    batches with equal doc counts and same-bucket nnz/vocab must yield
    IDENTICAL device array shapes (the jit signature), and shape_bucket
    must bound its padding at ~6.25%."""
    from document_search_engine_tpu.index.builder import shape_bucket

    for n in (1, 7, 255, 256, 1000, 5000, 54_100_000):
        b = shape_bucket(n)
        assert b >= n
        assert b - n <= max(256, n // 16), (n, b)
    cfg = IndexConfig()
    a1 = _stratified_analyzed(100, 8, 350, seed=61)
    a2 = _stratified_analyzed(100, 8, 350, seed=62)
    _h1, d1 = builder.build_segment_device(a1, cfg, doc_base=0)
    _h2, d2 = builder.build_segment_device(a2, cfg, doc_base=100)
    for name in ("post_doc", "post_val", "post_tf", "indptr", "row_start"):
        s1 = getattr(d1, name).shape
        s2 = getattr(d2, name).shape
        assert s1 == s2, (name, s1, s2)


def test_merge_stats():
    cfg = IndexConfig()
    a1 = builder.analyze_texts(["x y", "y z"], cfg)
    a2 = builder.analyze_texts(["y q"], cfg)
    h1, _ = builder.build_segment(a1, cfg, doc_base=0)
    h2, _ = builder.build_segment(a2, cfg, doc_base=2)
    stats = merge_stats([h1, h2])
    assert stats.n_alive == 3
    assert stats.total_len_alive == 6
    from document_search_engine_tpu.analyze.hashing import fnv1a64

    df_y = stats.df_of(np.array([fnv1a64("y")], dtype=np.uint64))
    assert df_y[0] == 3
    df_q = stats.df_of(np.array([fnv1a64("q")], dtype=np.uint64))
    assert df_q[0] == 1
    df_missing = stats.df_of(np.array([fnv1a64("nope")], dtype=np.uint64))
    assert df_missing[0] == 0
