"""Engine lifecycle features: checkpoint save/load, compact, corpus loader,
CLI, eval metrics (SURVEY.md §5)."""
import json
import sys

import numpy as np

from document_search_engine_tpu.config import IndexConfig, ScoringConfig
from document_search_engine_tpu.corpus.loader import load_dir, stream_batches
from document_search_engine_tpu.corpus.synth import synth_corpus, synth_queries
from document_search_engine_tpu.engine.engine import SearchEngine
from document_search_engine_tpu.eval.metrics import (
    mean_average_precision,
    recall_at_k,
)


def _engine_and_queries(kind="bm25", n=50, seed=2):
    docs = synth_corpus(n_docs=n, vocab_size=400, mean_len=30, seed=seed)
    queries = synth_queries(docs, n_queries=6, seed=seed + 1)
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind=kind)))
    eng.build(docs)
    return eng, docs, queries


def test_save_load_roundtrip(tmp_path):
    for kind in ("tfidf", "bm25"):
        eng, docs, queries = _engine_and_queries(kind)
        eng.add_docs(docs[:5])
        eng.delete_docs([1, 52])
        ref_ids, ref_scores = eng.search(queries, k=10)
        path = str(tmp_path / f"idx_{kind}")
        eng.save(path)
        eng2 = SearchEngine.load(path)
        ids, scores = eng2.search(queries, k=10)
        np.testing.assert_array_equal(ids, ref_ids)
        np.testing.assert_array_equal(scores, ref_scores)
        assert eng2.config.scoring.kind == kind


def test_compact_preserves_results():
    for kind in ("tfidf", "bm25"):
        eng, docs, queries = _engine_and_queries(kind, seed=5)
        eng.add_docs(docs[:10])  # second segment
        eng.delete_docs([0, 3, 55])
        ref_ids, ref_scores = eng.search(queries, k=10)
        n_seg_before = len(eng.segments)
        eng.compact()
        assert len(eng.segments) == 1
        assert n_seg_before == 2
        ids, scores = eng.search(queries, k=10)
        np.testing.assert_array_equal(ids, ref_ids)
        np.testing.assert_array_equal(scores, ref_scores)
        # deleted ids never come back
        assert not set(ids.ravel().tolist()) & {0, 3, 55}


def test_corpus_loader(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "b.txt").write_text("beta content")
    (d / "a.txt").write_text("alpha content")
    sub = d / "sub"
    sub.mkdir()
    (sub / "c.txt").write_text("gamma content")
    docs = load_dir(str(d))
    assert [n for n, _ in docs] == ["a.txt", "b.txt", "sub/c.txt"]
    batches = list(stream_batches(docs, batch_size=2))
    assert [len(b) for b in batches] == [2, 1]


def test_metrics():
    results = np.array([[3, 1, -1], [9, 9, 9]])
    relevant = [[3, 7], [1]]
    assert recall_at_k(results, relevant) == 0.25
    ap = mean_average_precision(results, relevant)
    assert 0.24 < ap < 0.26  # AP(q0)=1/2*(1/1)/... = 0.5; AP(q1)=0

    from document_search_engine_tpu.eval.metrics import ranking_agreement

    assert ranking_agreement(results, results) == 1.0


def test_cli_end_to_end(tmp_path, capsys):
    from document_search_engine_tpu.cli import main

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "one.txt").write_text("apples and oranges are fruit")
    (d / "two.txt").write_text("cars and trucks are vehicles")
    (d / "three.txt").write_text("apples grow on trees")
    idx = str(tmp_path / "idx")
    assert main(["index", str(d), "--out", idx, "--kind", "bm25"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["docs"] == 3
    assert main(["search", idx, "apples", "-k", "2"]) == 0
    out = capsys.readouterr().out
    assert "one.txt" in out or "three.txt" in out
    assert "two.txt" not in out
    assert main(["search", idx, "apples", "-k", "2", "--rerank"]) == 0
    assert "rerank=" in capsys.readouterr().out
    # pipelined stdin serving
    import io

    monkey_stdin = io.StringIO("apples\ncars\n")
    real_stdin = sys.stdin
    sys.stdin = monkey_stdin
    try:
        assert main(["serve", idx, "-k", "2", "--batch", "1"]) == 0
    finally:
        sys.stdin = real_stdin
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 2 and lines[0]["hits"] and lines[1]["hits"]


def test_cli_sharded_index(tmp_path, capsys):
    """CLI builds and queries a document-sharded index (--shards);
    search/serve auto-detect the checkpoint kind."""
    from document_search_engine_tpu.cli import main

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "one.txt").write_text("apples and oranges are fruit")
    (d / "two.txt").write_text("cars and trucks are vehicles")
    (d / "three.txt").write_text("apples grow on trees")
    idx = str(tmp_path / "idx_sharded")
    assert main(["index", str(d), "--out", idx, "--shards", "2"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["docs"] == 3
    assert main(["search", idx, "apples", "-k", "2"]) == 0
    out = capsys.readouterr().out
    assert "one.txt" in out or "three.txt" in out
    assert "two.txt" not in out
    # hybrid rerank works on sharded indexes too (SPMD dots + psum)
    assert main(["search", idx, "apples", "-k", "2", "--rerank"]) == 0
    assert "rerank=" in capsys.readouterr().out


def test_build_streaming_equals_bulk():
    from document_search_engine_tpu.corpus.loader import stream_batches
    from document_search_engine_tpu.oracle import OracleEngine

    docs = synth_corpus(n_docs=70, vocab_size=300, mean_len=25, seed=8)
    queries = synth_queries(docs, n_queries=5, seed=9)
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        bulk = SearchEngine(cfg)
        bulk.build(docs)
        stream = SearchEngine(cfg)
        stream.build_streaming(stream_batches(docs, batch_size=16))
        b_ids, b_scores = bulk.search(queries, k=10)
        s_ids, s_scores = stream.search(queries, k=10)
        np.testing.assert_array_equal(s_ids, b_ids)
        np.testing.assert_array_equal(s_scores, b_scores)
        ora = OracleEngine(cfg)
        ora.build(docs)
        o_ids, o_scores = ora.search(queries, k=10)
        np.testing.assert_array_equal(s_ids, o_ids)


def test_segment_lifecycle_bounded_fuzz():
    """Segment lifecycle policy (round-2 VERDICT #5): a long add/delete
    sequence keeps the segment count bounded via auto-compact, and the
    incrementally-maintained index stays bit-identical to a fresh
    rebuild of the same alive corpus."""
    rng = np.random.default_rng(33)
    pool = synth_corpus(n_docs=120, vocab_size=500, mean_len=25, seed=34)
    queries = synth_queries(pool, n_queries=5, seed=35)
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    eng = SearchEngine(cfg)
    eng.auto_compact_segments = 4
    eng.auto_compact_dead_frac = 0.4
    eng.build(pool[:20])
    texts = list(pool[:20])  # mirror of the corpus by global id
    alive = [True] * 20
    max_segments_seen = 1
    for _ in range(60):
        if rng.random() < 0.5:
            new = [pool[int(i)] for i in rng.integers(0, 120, 3)]
            ids = eng.add_docs(new)
            texts += new
            alive += [True] * len(new)
            assert ids == list(range(len(texts) - 3, len(texts)))
        else:
            live = [g for g, a in enumerate(alive) if a]
            if live:
                kill = [int(g) for g in rng.choice(live, size=min(4, len(live)), replace=False)]
                eng.delete_docs(kill)
                for g in kill:
                    alive[g] = False
        max_segments_seen = max(max_segments_seen, len(eng.segments))
        assert len(eng.segments) <= 5  # policy bound (4 + in-flight add)
    assert max_segments_seen >= 2  # the fuzz actually grew segments
    # parity vs a fresh engine over the same id/alive history
    ref = SearchEngine(cfg)
    ref.build(texts)
    ref.delete_docs([g for g, a in enumerate(alive) if not a])
    r_ids, r_sc = ref.search(queries, k=10)
    e_ids, e_sc = eng.search(queries, k=10)
    np.testing.assert_array_equal(e_ids, r_ids)
    np.testing.assert_array_equal(e_sc, r_sc)


def test_tfidf_inv_norm_memo():
    """A refresh with unchanged global stats must do zero norm work
    (memo on the stats fingerprint); changed stats must recompute.
    (An O(df-affected-docs) partial refresh is impossible under the
    spec: idf = ln(N/df) couples every norm to N — builder.doc_inv_norms
    docstring.)"""
    from document_search_engine_tpu.index import builder

    docs = synth_corpus(n_docs=60, vocab_size=300, mean_len=20, seed=41)
    cfg = IndexConfig(scoring=ScoringConfig(kind="tfidf"))
    eng = SearchEngine(cfg)
    eng.build(docs)
    calls = {"n": 0}
    real = builder.doc_inv_norms

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    builder.doc_inv_norms = counting
    try:
        eng._refresh_stats_and_vals()  # same stats -> memo hit
        assert calls["n"] == 0
        eng.delete_docs([3])  # N and df change -> full recompute
        assert calls["n"] == 1
    finally:
        builder.doc_inv_norms = real
    # and the refreshed engine still matches the oracle
    from document_search_engine_tpu.oracle import OracleEngine

    ora = OracleEngine(cfg)
    ora.build(docs)
    ora.delete_docs([3])
    queries = synth_queries(docs, n_queries=4, seed=42)
    o_ids, o_sc = ora.search(queries, k=10)
    e_ids, e_sc = eng.search(queries, k=10)
    np.testing.assert_array_equal(e_ids, o_ids)
    np.testing.assert_array_equal(e_sc, o_sc)


def test_k_beyond_lane_width_matches_oracle():
    """k > 128 (the Pallas rank kernels store top-k in one 128-lane
    vector) must take the bit-identical XLA fallback — for every scorer
    mode, including a forced "fused" (round-2 VERDICT/ADVICE: the
    fallback existed but nothing tested k>128)."""
    from document_search_engine_tpu.oracle import OracleEngine

    docs = synth_corpus(n_docs=300, vocab_size=500, mean_len=30, seed=21)
    queries = synth_queries(docs, n_queries=4, seed=22)
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        ora = OracleEngine(cfg)
        ora.build(docs)
        o_ids, o_scores = ora.search(queries, k=200)
        for scorer in (None, "fused", "fused_dv", "xla_rank"):
            eng = SearchEngine(cfg)
            eng.scorer = scorer
            eng.build(docs)
            ids, scores = eng.search(queries, k=200)
            np.testing.assert_array_equal(ids, o_ids, err_msg=str(scorer))
            np.testing.assert_array_equal(scores, o_scores)
    # a query matching >200 docs actually fills slots past lane 128
    assert (o_ids[:, 129:] > -1).any()


def test_fused_search_wrapper_large_k_falls_back():
    """ops/fused_pallas.fused_search (the public wrapper) must return
    real results for k > 128, not 128 real + padded -1 slots."""
    import jax.numpy as jnp

    from document_search_engine_tpu.index import builder
    from document_search_engine_tpu.ops.fused_pallas import fused_search
    from document_search_engine_tpu.oracle import spec

    docs = synth_corpus(n_docs=400, vocab_size=60, mean_len=40, seed=31)
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    a = builder.analyze_texts_fast(docs, cfg)
    host, dev = builder.build_segment(a, cfg)
    rows = np.array([[0, 1, 2, 3]], np.int32)
    coeff = np.ones((1, 4), np.float32)
    scale = float(np.float32(2.0**cfg.scoring.scale_bits))
    clip = float(np.float32(int(spec.quant_clip_max(cfg.max_query_terms))))
    vals, gids = fused_search(
        dev.post_doc, dev.post_val, host.row_start, host.indptr,
        rows, coeff, doc_base=0, n_blocks=16, block=512, k=200,
        n_docs=host.n_docs, scale=scale, clip=clip, interpret=True,
    )
    vals = np.asarray(vals)
    # the old truncation padded everything past lane 128 with -1
    assert (vals[0, 129:] > 0).any()
    assert (np.diff(vals[0][vals[0] > 0]) <= 0).all()  # still ranked


def test_prof_utils():
    from document_search_engine_tpu.utils import prof

    prof.reset()
    with prof.phase("build"):
        pass
    with prof.phase("search"):
        pass
    import json as _json

    rec = _json.loads(prof.metrics_json(extra_field=1))
    assert set(rec["phases_s"]) == {"build", "search"}
    assert rec["extra_field"] == 1


def test_checkpoint_format_guards(tmp_path):
    import json as _json

    import pytest as _pytest

    from document_search_engine_tpu.parallel.dist import (
        DistributedSearchEngine,
    )

    eng, docs, _q = _engine_and_queries()
    p1 = str(tmp_path / "plain")
    eng.save(p1)
    # wrong loader for the checkpoint kind
    with _pytest.raises(ValueError):
        DistributedSearchEngine.load(p1)
    # future format version rejected cleanly
    meta = _json.load(open(f"{p1}/meta.json"))
    meta["format_version"] = 99
    _json.dump(meta, open(f"{p1}/meta.json", "w"))
    with _pytest.raises(ValueError):
        SearchEngine.load(p1)


def _synth_hosts(n_docs, tpd, vocab, seed=0, doc_base=0):
    """A SegmentHost built from synthetic analyzed docs (no text work):
    each doc gets `tpd` distinct ascending term hashes (one per vocab
    stratum) — cheap enough to build 200k docs inside a unit test."""
    from document_search_engine_tpu.index import builder

    rng = np.random.default_rng(seed)
    vocab_h = np.unique(
        rng.integers(1, 2**63, vocab * 2, dtype=np.uint64)
    )[:vocab]
    stride = vocab // tpd
    idx = rng.integers(0, stride, (n_docs, tpd)) + np.arange(tpd) * stride
    hashes = vocab_h[idx].ravel()
    tfs = rng.integers(1, 4, n_docs * tpd).astype(np.int32)
    a = builder.AnalyzedDocs(
        hashes=hashes,
        tfs=tfs,
        doc_ptr=np.arange(n_docs + 1, dtype=np.int64) * tpd,
        dl=tfs.reshape(n_docs, tpd).sum(1).astype(np.int32),
    )
    return builder.build_host_segment(a, doc_base)


def test_delete_docs_vectorized_matches_per_doc_reference():
    """delete_from_hosts == the per-doc loop it replaced, including
    duplicates, already-dead ids, and out-of-range ids (round-3 VERDICT
    #5 correctness half)."""
    import copy

    from document_search_engine_tpu.engine.engine import delete_from_hosts

    h0 = _synth_hosts(40, 4, 80, seed=1, doc_base=0)
    h1 = _synth_hosts(25, 4, 60, seed=2, doc_base=40)
    hosts = [h0, h1]
    ref = copy.deepcopy(hosts)
    gids = [0, 0, 3, 39, 40, 41, 64, 64, -5, 65, 200, 7]

    def ref_delete(hosts_, gids_):
        changed = False
        for g in gids_:
            for host in hosts_:
                if host.doc_base <= g < host.doc_base + host.n_docs:
                    ld = g - host.doc_base
                    if host.alive[ld]:
                        host.alive[ld] = False
                        s, e = host.doc_ptr[ld], host.doc_ptr[ld + 1]
                        rows = np.searchsorted(
                            host.term_hash, host.doc_hashes[s:e]
                        )
                        host.df[rows] -= 1
                        changed = True
                    break
        return changed

    # second round deletes only already-dead / out-of-range ids
    for round_gids in (gids, [0, 3, -1, 999]):
        got = delete_from_hosts(hosts, round_gids)
        want = ref_delete(ref, round_gids)
        assert got == want
        for h_new, h_ref in zip(hosts, ref):
            np.testing.assert_array_equal(h_new.alive, h_ref.alive)
            np.testing.assert_array_equal(h_new.df, h_ref.df)


def test_delete_docs_host_work_is_vectorized_at_scale():
    """Deleting 50k docs from a 200k-doc two-segment index must be
    vectorized host work (sub-second), not a per-doc Python loop
    (round-3 VERDICT #5 scale half). The device refresh is stubbed —
    it is O(index) by design and unchanged by this path."""
    import time

    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    h0 = _synth_hosts(150_000, 8, 20_000, seed=3, doc_base=0)
    h1 = _synth_hosts(50_000, 8, 20_000, seed=4, doc_base=150_000)
    eng.segments = [[h0, None], [h1, None]]
    eng.n_docs_total = 200_000
    calls = []
    eng._refresh_stats_and_vals = lambda: calls.append(1)
    eng._maybe_auto_compact = lambda: None
    rng = np.random.default_rng(9)
    gids = rng.choice(200_000, size=50_000, replace=False)
    t0 = time.perf_counter()
    eng.delete_docs(gids)
    dt = time.perf_counter() - t0
    assert calls == [1]  # exactly one refresh
    assert dt < 2.0, f"vectorized delete took {dt:.2f}s"
    assert int(h0.alive.sum()) + int(h1.alive.sum()) == 150_000
    # exact df accounting: recount from scratch and compare
    for h in (h0, h1):
        doc_of = np.repeat(
            np.arange(h.n_docs), np.diff(h.doc_ptr).astype(np.int64)
        )
        mask = h.alive[doc_of]
        rows = np.searchsorted(h.term_hash, h.doc_hashes[mask])
        want = np.bincount(rows, minlength=h.n_terms).astype(np.int32)
        np.testing.assert_array_equal(h.df, want)


def _compact_capture(eng):
    """Run eng.compact() with the segment rebuild + device refresh
    stubbed, capturing the merged AnalyzedDocs and the dead mask the
    vectorized assembly produced (the part round-4 VERDICT #2 flagged
    as a per-doc Python loop)."""
    from types import SimpleNamespace

    captured = {}

    def fake_build(analyzed, doc_base):
        captured["a"] = analyzed
        captured["base"] = doc_base
        return (
            SimpleNamespace(alive=np.ones(analyzed.n_docs, bool)),
            None,
        )

    eng._build_segment = fake_build
    eng._refresh_stats_and_vals = lambda: None
    eng.compact()
    host = eng.segments[0][0]
    return captured["a"], ~host.alive, captured["base"]


def test_compact_assembly_matches_per_doc_reference():
    """The vectorized compact assembly == the per-doc loop it replaced
    (round-4 VERDICT #2 correctness half), including dead docs in both
    segments, a fully-dead prefix and interleaved tombstones."""
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    h0 = _synth_hosts(300, 5, 900, seed=11, doc_base=0)
    h1 = _synth_hosts(180, 5, 900, seed=12, doc_base=300)
    rng = np.random.default_rng(13)
    h0.alive[:7] = False  # dead prefix
    h0.alive[rng.choice(300, 60, replace=False)] = False
    h1.alive[rng.choice(180, 40, replace=False)] = False
    eng.segments = [[h0, None], [h1, None]]
    eng.n_docs_total = 480

    # per-doc reference (the code shape compact() had before round 5)
    n = 480
    hp, tp = [], []
    ptr = np.zeros(n + 1, np.int64)
    dl = np.zeros(n, np.int32)
    dead = np.zeros(n, bool)
    for host in (h0, h1):
        for ld in range(host.n_docs):
            g = host.doc_base + ld
            if host.alive[ld]:
                s, e = host.doc_ptr[ld], host.doc_ptr[ld + 1]
                hp.append(host.doc_hashes[s:e])
                tp.append(host.doc_tfs[s:e])
                ptr[g + 1] = e - s
                dl[g] = host.dl[ld]
            else:
                dead[g] = True
    np.cumsum(ptr, out=ptr)

    a, got_dead, base = _compact_capture(eng)
    assert base == 0
    np.testing.assert_array_equal(a.hashes, np.concatenate(hp))
    np.testing.assert_array_equal(a.tfs, np.concatenate(tp))
    np.testing.assert_array_equal(a.doc_ptr, ptr)
    np.testing.assert_array_equal(a.dl, dl)
    np.testing.assert_array_equal(got_dead, dead)


def test_compact_host_work_is_vectorized_at_scale():
    """Compacting a 200k-doc two-segment engine with 60k tombstones must
    assemble the merged postings in vectorized host work (sub-second),
    not a per-doc Python loop (round-4 VERDICT #2 scale half — at the
    Wikipedia config's 6M docs the old loop was minutes of host time).
    The segment rebuild + device refresh are stubbed: they are O(corpus)
    jit work by design and unchanged by this path."""
    import time

    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    h0 = _synth_hosts(150_000, 8, 20_000, seed=14, doc_base=0)
    h1 = _synth_hosts(50_000, 8, 20_000, seed=15, doc_base=150_000)
    rng = np.random.default_rng(16)
    gids = rng.choice(200_000, size=60_000, replace=False)
    h0.alive[gids[gids < 150_000]] = False
    h1.alive[gids[gids >= 150_000] - 150_000] = False
    eng.segments = [[h0, None], [h1, None]]
    eng.n_docs_total = 200_000
    t0 = time.perf_counter()
    a, got_dead, _ = _compact_capture(eng)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"vectorized compact assembly took {dt:.2f}s"
    assert a.n_docs == 200_000
    assert int(got_dead.sum()) == 60_000
    # postings count: exactly the alive docs' lens survive
    want_nnz = 8 * (200_000 - 60_000)  # 8 terms per synthetic doc
    assert len(a.hashes) == want_nnz
    assert int(a.doc_ptr[-1]) == want_nnz
