"""The single-DMA dv-plane kernel (ops/fused_dv.py) must equal the
two-plane fused kernel bit-for-bit on the same plan tables (interpret
mode on CPU; the same comparison runs on hardware in test_tpu_smoke)."""
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.ops.fused_dv import (
    fused_search_dv,
    interleave_planes,
)
from document_search_engine_tpu.ops.fused_pallas import fused_search
from document_search_engine_tpu.ops.schedule import block_plan
from test_fused_pallas import _csr
from test_packed import make_aligned


def _compare(seed, nq, s, blocksize, k, n_terms, n_docs, max_len,
             missing_frac=0.0, empty_rows=()):
    rng = np.random.default_rng(seed)
    indptr, post_doc, post_val, _nnz = _csr(rng, n_terms, n_docs, max_len)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
    coeff = rng.random((nq, s)).astype(np.float32) * 1.5
    if missing_frac:
        coeff[rng.random((nq, s)) < missing_frac] = 0.0
    for r in empty_rows:
        coeff[r] = 0.0
    scale = float(np.float32(2.0**16))
    clip = float(np.float32(65075262.0))
    nb = block_plan(indptr, rows, coeff > 0, block=blocksize)
    ref = fused_search(
        jnp.asarray(d2), jnp.asarray(v2), row_start, indptr, rows,
        coeff, doc_base=50, n_blocks=nb, block=blocksize, k=k,
        n_docs=n_docs, scale=scale, clip=clip, interpret=True,
    )
    dv = interleave_planes(jnp.asarray(d2), jnp.asarray(v2))
    assert dv.shape == (d2.shape[0] + 8, 256)
    got = fused_search_dv(
        dv, row_start, indptr, rows, coeff, doc_base=50, n_blocks=nb,
        block=blocksize, k=k, n_docs=n_docs, scale=scale, clip=clip,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got[0]), np.asarray(ref[0]), f"vals seed={seed}"
    )
    np.testing.assert_array_equal(
        np.asarray(got[1]), np.asarray(ref[1]), f"gids seed={seed}"
    )


def test_dv_matches_fused_basic():
    for blocksize in (256, 512):
        _compare(41, nq=8, s=4, blocksize=blocksize, k=10, n_terms=20,
                 n_docs=2500, max_len=1500)


def test_dv_matches_fused_compaction_fuzz():
    """Stacked queries with wildly different compaction offsets, empty
    queries inside a stacked program, and (seed 9) k=17 through the
    regionized bitonic tournament — the same shapes the fused kernel's
    own fuzz gate runs."""
    for seed in (7, 8, 9):
        _compare(
            seed, nq=8, s=4, blocksize=1024, k=17 if seed == 9 else 10,
            n_terms=30, n_docs=5000, max_len=3000, missing_frac=0.4,
            empty_rows=(0, 5),
        )


def test_dv_matches_fused_large_block():
    """The production 4096-block family (one DMA is (32, 256))."""
    _compare(13, nq=8, s=8, blocksize=4096, k=10, n_terms=24,
             n_docs=9000, max_len=6000)


def test_engine_fused_dv_parity_and_cache_invalidation():
    """Engine-level: scorer="fused_dv" matches the oracle through the
    full dispatch path (interpret mode on CPU), and the per-segment dv
    plane cache invalidates when add/delete swap the source planes."""
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.corpus.synth import (
        synth_corpus,
        synth_queries,
    )
    from document_search_engine_tpu.engine.engine import SearchEngine
    from document_search_engine_tpu.oracle import OracleEngine

    docs = synth_corpus(n_docs=90, vocab_size=400, mean_len=25, seed=51)
    queries = synth_queries(docs, n_queries=4, seed=52) + [""]
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    eng = SearchEngine(cfg)
    eng.scorer = "fused_dv"
    eng.build(docs)
    ora = OracleEngine(cfg)
    ora.build(docs)
    oi, osc = ora.search(queries, k=10)
    ei, esc = eng.search(queries, k=10)
    np.testing.assert_array_equal(ei, oi)
    np.testing.assert_array_equal(esc, osc)
    planes_before = [p for _, p in sorted(eng._dv_cache.items())]
    # mutate: delete + add swap the plane objects -> cache must refresh
    eng.delete_docs([3, 40])
    ora.delete_docs([3, 40])
    eng.add_docs(docs[:2])
    ora.add_docs(docs[:2])
    ei, esc = eng.search(queries, k=10)
    oi, osc = ora.search(queries, k=10)
    np.testing.assert_array_equal(ei, oi)
    np.testing.assert_array_equal(esc, osc)
    planes_after = [p for _, p in sorted(eng._dv_cache.items())]
    assert planes_after[0][1] is not planes_before[0][1]
