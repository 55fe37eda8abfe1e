"""TPU-hardware smoke tests — skipped under the CPU test backend.

Run manually on the real chip:
    DSE_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
(the env flag stops conftest from forcing the CPU backend). Validates the
two hardware contracts
the suite can't check on CPU: lax.top_k tie stability on TPU, and engine
parity vs the oracle executed on the actual device.
"""
import jax
import numpy as np
import pytest

on_tpu = any(d.platform == "tpu" for d in jax.devices())
needs_tpu = pytest.mark.skipif(not on_tpu, reason="no TPU in this backend")


@needs_tpu
def test_topk_tie_stability_on_tpu():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.integers(0, 5, size=(4, 4096)).astype(np.int32)
    _, idx = jax.lax.top_k(jnp.asarray(x), 50)
    idx = np.asarray(idx)
    for r in range(4):
        expect = np.lexsort((np.arange(4096), -x[r]))[:50]
        np.testing.assert_array_equal(idx[r], expect)


@needs_tpu
def test_engine_oracle_parity_on_tpu():
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine
    from document_search_engine_tpu.oracle import OracleEngine

    docs = synth_corpus(n_docs=120, vocab_size=700, mean_len=40, seed=77)
    queries = synth_queries(docs, n_queries=8, seed=78) + ["", "zzz"]
    for kind in ("tfidf", "bm25"):
        cfg = IndexConfig(scoring=ScoringConfig(kind=kind))
        eng = SearchEngine(cfg)
        eng.build(docs)
        ora = OracleEngine(cfg)
        ora.build(docs)
        ei, es = eng.search(queries, k=10)
        oi, os_ = ora.search(queries, k=10)
        np.testing.assert_array_equal(ei, oi)
        np.testing.assert_array_equal(es, os_)
