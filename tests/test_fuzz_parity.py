"""Randomized cross-engine parity fuzzing: random configs, corpora, and
operation sequences must keep engine == oracle bit-identical. This is the
load-bearing confidence test beyond the handcrafted cases."""
import numpy as np
import pytest

from document_search_engine_tpu.config import (
    AnalyzerConfig,
    IndexConfig,
    ScoringConfig,
)
from document_search_engine_tpu.corpus.synth import synth_corpus, synth_queries
from document_search_engine_tpu.engine.engine import SearchEngine
from document_search_engine_tpu.oracle import OracleEngine


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_random_ops_parity(seed):
    rng = np.random.default_rng(seed)
    kind = rng.choice(["tfidf", "bm25"])
    cfg = IndexConfig(
        analyzer=AnalyzerConfig(
            min_token_len=int(rng.integers(1, 3)),
            max_token_len=int(rng.integers(8, 64)),
            stopwords=tuple(
                rng.choice(["ba", "ke", "lu", "mi"], rng.integers(0, 3), replace=False)
            ),
        ),
        scoring=ScoringConfig(
            kind=str(kind),
            k1=float(rng.uniform(0.5, 2.0)),
            b=float(rng.uniform(0.0, 1.0)),
        ),
        max_query_terms=int(rng.integers(4, 33)),
    )
    docs = synth_corpus(
        n_docs=int(rng.integers(30, 120)),
        vocab_size=int(rng.integers(100, 800)),
        mean_len=int(rng.integers(10, 80)),
        seed=seed,
    )
    queries = synth_queries(
        docs,
        n_queries=int(rng.integers(3, 12)),
        terms_per_query=int(rng.integers(1, 10)),
        seed=seed + 1,
    ) + ["", "zzz absent words"]

    eng = SearchEngine(cfg)
    ora = OracleEngine(cfg)
    n0 = int(rng.integers(10, len(docs)))
    eng.build(docs[:n0])
    ora.build(docs[:n0])

    def check(msg):
        k = int(rng.integers(1, 25))
        ei, es = eng.search(queries, k=k)
        oi, os_ = ora.search(queries, k=k)
        np.testing.assert_array_equal(ei, oi, err_msg=msg)
        np.testing.assert_array_equal(es, os_, err_msg=msg)

    check("initial build")
    for step in range(3):
        op = rng.choice(["add", "delete", "compact"])
        if op == "add" and n0 < len(docs):
            hi = min(len(docs), n0 + int(rng.integers(1, 20)))
            eng.add_docs(docs[n0:hi])
            ora.add_docs(docs[n0:hi])
            n0 = hi
        elif op == "delete":
            ids = rng.integers(0, n0, size=rng.integers(1, 6)).tolist()
            eng.delete_docs(ids)
            ora.delete_docs(ids)
        else:
            eng.compact()  # oracle needs no compact; results must match
        check(f"after {op} (step {step})")


def test_idf_zero_term_in_every_doc():
    """A term present in every doc has tfidf idf=0 -> contributes nothing;
    parity must hold (and bm25 still scores it slightly)."""
    docs = [f"common word{i}" for i in range(6)]
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        eng, ora = SearchEngine(cfg), OracleEngine(cfg)
        eng.build(docs)
        ora.build(docs)
        ei, es = eng.search(["common", "common word3"], k=6)
        oi, os_ = ora.search(["common", "common word3"], k=6)
        np.testing.assert_array_equal(ei, oi)
        np.testing.assert_array_equal(es, os_)
        if kind == "tfidf":
            # 'common' alone: idf 0 -> no matches at all
            assert (ei[0] == -1).all()


def test_degenerate_inputs():
    eng = SearchEngine()
    eng.build(["alpha beta", "", "...", "gamma"])
    ora = OracleEngine()
    ora.build(["alpha beta", "", "...", "gamma"])
    ei, es = eng.search(["alpha", ""], k=4)
    oi, os_ = ora.search(["alpha", ""], k=4)
    np.testing.assert_array_equal(ei, oi)
    np.testing.assert_array_equal(es, os_)
    # double delete + missing id are no-ops beyond the first
    eng.delete_docs([0])
    eng.delete_docs([0, 999])
    ora.delete_docs([0])
    ora.delete_docs([0])
    ei, _ = eng.search(["alpha"], k=2)
    oi, _ = ora.search(["alpha"], k=2)
    np.testing.assert_array_equal(ei, oi)
    with pytest.raises(ValueError):
        eng.search(["x"], k=0)
    with pytest.raises(ValueError):
        ora.search(["x"], k=-1)


def test_clip_saturation_parity():
    """Regression: the per-contribution overflow clip must be exactly
    f32-representable, or the device (f32 clip) and oracle (int clip)
    disagree at the saturation boundary."""
    from document_search_engine_tpu.oracle import spec

    clip = int(spec.quant_clip_max(32))
    assert np.float32(clip) == clip  # representable
    # a rare term repeated many times in the query saturates bm25's clip
    docs = ["raretoken here"] + [f"filler{i} text" for i in range(400)]
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    eng = SearchEngine(cfg)
    eng.build(docs)
    ora = OracleEngine(cfg)
    ora.build(docs)
    q = " ".join(["raretoken"] * 200)
    ei, es = eng.search([q], k=3)
    oi, os_ = ora.search([q], k=3)
    np.testing.assert_array_equal(ei, oi)
    np.testing.assert_array_equal(es, os_)
    assert es[0, 0] == clip  # actually saturated


@pytest.mark.parametrize("seed", [707, 808])
def test_fuzz_sharded_random_ops(seed):
    """Random op sequences on the sharded engine must stay bit-identical
    to the single-device engine (which is itself oracle-gated)."""
    from document_search_engine_tpu.parallel.dist import (
        DistributedSearchEngine,
    )
    from document_search_engine_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(seed)
    kind = str(rng.choice(["tfidf", "bm25"]))
    cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
    docs = synth_corpus(
        n_docs=int(rng.integers(40, 100)),
        vocab_size=int(rng.integers(150, 600)),
        mean_len=int(rng.integers(15, 60)),
        seed=seed,
    )
    queries = synth_queries(docs, 8, 5, seed=seed + 1) + [""]
    single = SearchEngine(cfg)
    dist = DistributedSearchEngine(
        cfg, mesh=make_mesh(int(rng.choice([2, 3, 4, 8])))
    )
    n0 = int(rng.integers(20, len(docs)))
    single.build(docs[:n0])
    dist.build(docs[:n0])
    for step in range(3):
        op = rng.choice(["add", "delete", "search"])
        if op == "add" and n0 < len(docs):
            hi = min(len(docs), n0 + int(rng.integers(1, 15)))
            single.add_docs(docs[n0:hi])
            dist.add_docs(docs[n0:hi])
            n0 = hi
        elif op == "delete":
            ids = rng.integers(0, n0, size=rng.integers(1, 5)).tolist()
            single.delete_docs(ids)
            dist.delete_docs(ids)
        k = int(rng.integers(1, 20))
        si, ss = single.search(queries, k=k)
        di, ds = dist.search(queries, k=k)
        np.testing.assert_array_equal(di, si, err_msg=f"step {step} {op}")
        np.testing.assert_array_equal(ds, ss, err_msg=f"step {step} {op}")
