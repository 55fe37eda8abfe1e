"""Plan layout cache: the serving jit-signature space must be bounded
(round-3 VERDICT #1 — one compiled program per traffic shape, not one
per batch) without changing any result bit."""
import numpy as np

from document_search_engine_tpu.config import IndexConfig, ScoringConfig
from document_search_engine_tpu.corpus.synth import synth_corpus, synth_queries
from document_search_engine_tpu.engine.engine import SearchEngine
from document_search_engine_tpu.ops.plan_cache import PlanLayoutCache


def _natural(counts_by_cell):
    """Build a natural plan [(idx, nb, blk, rc)] with the given query
    counts; indices are a disjoint cover of range(total)."""
    out, off = [], 0
    for (nb, blk, rc), c in counts_by_cell.items():
        out.append((np.arange(off, off + c), nb, blk, rc))
        off += c
    return out, off


def test_layout_converges_and_covers_every_query():
    cache = PlanLayoutCache()
    key = ("seg", 0)
    # batch 1: two stable cells + one noise cell (3 queries)
    nat1, nq1 = _natural({(8, 2048, 64): 900, (32, 2048, 256): 120,
                          (64, 2048, 512): 3})
    cells1 = cache.canonicalize(key, nat1, nq1)
    assert cache.grows == 1
    # every query assigned exactly once, inside a dominating cell
    seen = np.concatenate([c[0] for c in cells1])
    assert sorted(seen.tolist()) == list(range(nq1))
    for idx, nb, blk, rc, bq in cells1:
        assert len(idx) <= bq
    # the noise cell was folded: no compiled cell is tiny
    layout = cache._layouts[key]
    assert all(bq >= 8 for (_nb, _blk, _rc, bq) in layout)

    # batch 2: same shape, slightly different counts -> HIT, no growth
    nat2, nq2 = _natural({(8, 2048, 64): 930, (32, 2048, 256): 90,
                          (64, 2048, 512): 4})
    cells2 = cache.canonicalize(key, nat2, nq2)
    assert cache.grows == 1 and cache.hits == 1
    assert tuple((nb, blk, rc, bq) for _i, nb, blk, rc, bq in cells2) == layout
    seen2 = np.concatenate([c[0] for c in cells2])
    assert sorted(seen2.tolist()) == list(range(nq2))

    # batch 3: a genuinely new heavy cell -> one growth, then stable
    nat3, nq3 = _natural({(8, 2048, 64): 900, (128, 2048, 1024): 100})
    cache.canonicalize(key, nat3, nq3)
    assert cache.grows == 2
    cache.canonicalize(key, nat3, nq3)
    assert cache.grows == 2 and cache.hits == 2


def test_overflow_spills_to_dominating_cell():
    cache = PlanLayoutCache(headroom=1.0)
    key = "k"
    nat1, nq1 = _natural({(8, 2048, 64): 64, (16, 2048, 128): 64})
    cache.canonicalize(key, nat1, nq1)
    # 80 light queries: 64 fit the exact cell, 16 spill into the
    # dominating (16, 2048, 128) cell — still a hit, zero growth
    nat2, nq2 = _natural({(8, 2048, 64): 80, (16, 2048, 128): 30})
    cells = cache.canonicalize(key, nat2, nq2)
    assert cache.grows == 1 and cache.hits == 1
    seen = np.concatenate([c[0] for c in cells])
    assert sorted(seen.tolist()) == list(range(nq2))


def test_engine_results_identical_with_and_without_cache():
    """The cache only moves queries to larger-budget cells; every
    result must stay bit-identical, and varied batches must converge
    to a handful of compiled layouts."""
    docs = synth_corpus(n_docs=300, vocab_size=800, mean_len=40, seed=31)
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    eng.build(docs)
    ref = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    ref.plan_cache = None
    ref.build(docs)
    rng = np.random.default_rng(5)
    for b in range(5):
        queries = synth_queries(docs, n_queries=40, seed=100 + b)
        # vary query weight so bucket needs differ across batches
        queries = [
            " ".join([q] * rng.integers(1, 3)) for q in queries
        ]
        ids_a, sc_a = eng.search(queries, k=10)
        ids_b, sc_b = ref.search(queries, k=10)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_array_equal(sc_a, sc_b)
    assert eng.plan_cache.grows <= 3, eng.plan_cache.stats()
    assert eng.plan_cache.hits >= 2, eng.plan_cache.stats()


def test_engine_warmup_precompiles_serving_layout():
    docs = synth_corpus(n_docs=200, vocab_size=500, mean_len=30, seed=7)
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    eng.build(docs)
    eng.warmup(nq=64, k=10, terms_per_query=4)
    grows0 = eng.plan_cache.grows
    assert grows0 >= 1
    # real traffic of the same shape mostly reuses the warmed layout
    queries = synth_queries(docs, n_queries=64, seed=8)
    ids, _ = eng.search(queries, k=10)
    assert ids.shape == (64, 10)
    assert eng.plan_cache.grows <= grows0 + 1
    # warmup on an empty engine is a no-op
    SearchEngine(IndexConfig()).warmup(nq=8, k=5)


def test_plan_layouts_persist_across_checkpoint(tmp_path):
    """Converged layouts ride in the checkpoint (round-4 VERDICT #5):
    save -> load -> replay of the seeding traffic pins ZERO layout
    grows in the loaded process, with bit-identical results."""
    docs = synth_corpus(n_docs=250, vocab_size=700, mean_len=35, seed=17)
    eng = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    eng.build(docs)
    batches = [
        synth_queries(docs, n_queries=48, seed=200 + b) for b in range(4)
    ]
    eng.preplan(batches, k=10)
    ref = [eng.search(b, k=10) for b in batches]
    assert eng.plan_cache.grows >= 1
    path = str(tmp_path / "idx")
    eng.save(path)
    eng2 = SearchEngine.load(path)
    assert eng2.plan_cache.grows == 0  # restore is not growth
    for b, (ri, rs) in zip(batches, ref):
        ids, sc = eng2.search(b, k=10)
        np.testing.assert_array_equal(ids, ri)
        np.testing.assert_array_equal(sc, rs)
    assert eng2.plan_cache.grows == 0, eng2.plan_cache.stats()
    assert eng2.plan_cache.hits >= len(batches), eng2.plan_cache.stats()


def test_sharded_plan_layouts_persist_across_checkpoint(tmp_path):
    """Sharded twin of the zero-grow warm start: same mesh size on
    load -> restored layouts hit; a different mesh size simply never
    matches (keys embed the mesh geometry) and re-converges."""
    from document_search_engine_tpu.parallel.dist import (
        DistributedSearchEngine,
    )
    from document_search_engine_tpu.parallel.mesh import make_mesh

    docs = synth_corpus(n_docs=180, vocab_size=500, mean_len=30, seed=19)
    deng = DistributedSearchEngine(
        IndexConfig(scoring=ScoringConfig(kind="bm25")), mesh=make_mesh(2)
    )
    deng.build(docs)
    batches = [
        synth_queries(docs, n_queries=32, seed=300 + b) for b in range(3)
    ]
    deng.preplan(batches, k=10)
    ref = [deng.search(b, k=10) for b in batches]
    assert deng.plan_cache.grows >= 1
    path = str(tmp_path / "sidx")
    deng.save(path)
    deng2 = DistributedSearchEngine.load(path, mesh=make_mesh(2))
    assert deng2.plan_cache.grows == 0
    for b, (ri, rs) in zip(batches, ref):
        ids, sc = deng2.search(b, k=10)
        np.testing.assert_array_equal(ids, ri)
        np.testing.assert_array_equal(sc, rs)
    assert deng2.plan_cache.grows == 0, deng2.plan_cache.stats()
    assert deng2.plan_cache.hits >= len(batches)
    # elastic reshard to 4: restored 2-shard layouts never match, the
    # engine re-converges, results stay bit-identical
    deng4 = DistributedSearchEngine.load(path, mesh=make_mesh(4))
    for b, (ri, rs) in zip(batches, ref):
        ids, sc = deng4.search(b, k=10)
        np.testing.assert_array_equal(ids, ri)
        np.testing.assert_array_equal(sc, rs)


def test_sharded_warmup_precompiles_serving_layout():
    """DistributedSearchEngine.warmup (round-4 VERDICT #4: the sharded
    engine had preplan() but no warmup(), so a sharded process's first
    real batch compiled during serving)."""
    from document_search_engine_tpu.parallel.dist import (
        DistributedSearchEngine,
    )
    from document_search_engine_tpu.parallel.mesh import make_mesh

    docs = synth_corpus(n_docs=160, vocab_size=500, mean_len=30, seed=9)
    deng = DistributedSearchEngine(
        IndexConfig(scoring=ScoringConfig(kind="bm25")), mesh=make_mesh(2)
    )
    deng.build(docs)
    deng.warmup(nq=64, k=10, terms_per_query=4)
    grows0 = deng.plan_cache.grows
    assert grows0 >= 1
    # real traffic of the same shape mostly reuses the warmed layout,
    # and the warmed sharded engine still matches the single engine
    queries = synth_queries(docs, n_queries=64, seed=10)
    ids, sc = deng.search(queries, k=10)
    assert ids.shape == (64, 10)
    assert deng.plan_cache.grows <= grows0 + 1
    single = SearchEngine(IndexConfig(scoring=ScoringConfig(kind="bm25")))
    single.build(docs)
    si, ss = single.search(queries, k=10)
    np.testing.assert_array_equal(ids, si)
    np.testing.assert_array_equal(sc, ss)
    # warmup on an empty engine is a no-op
    DistributedSearchEngine(
        IndexConfig(), mesh=make_mesh(2)
    ).warmup(nq=8, k=5)
