"""The fused DMA-pack+score+rank kernel must equal the XLA paths
bit-for-bit on the same plan tables (interpret mode on CPU; the same
comparison runs on hardware in test_tpu_smoke.py)."""
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.ops.fused_pallas import (
    fused_search,
    plan_tables,
)
from document_search_engine_tpu.ops.packed import (
    search_packed,
    search_packed_tables,
    total_cap,
)
from document_search_engine_tpu.ops.schedule import block_plan
from test_packed import make_aligned


def _csr(rng, n_terms, n_docs, max_len):
    lens = rng.integers(1, max_len, n_terms)
    indptr64 = np.zeros(n_terms + 1, np.int64)
    np.cumsum(lens, out=indptr64[1:])
    nnz = int(indptr64[-1])
    parts = [
        np.sort(rng.choice(n_docs, size=l, replace=False).astype(np.int32))
        for l in lens
    ]
    post_doc = np.concatenate(parts)
    post_val = rng.random(nnz, dtype=np.float32) * 0.9 + 0.05
    return indptr64.astype(np.int32), post_doc, post_val, nnz


def test_fused_kernel_matches_xla_paths():
    rng = np.random.default_rng(41)
    n_terms, n_docs = 20, 2500
    indptr, post_doc, post_val, nnz = _csr(rng, n_terms, n_docs, 1500)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    for blocksize in (256, 512):
        nq, s = 8, 4  # nq divisible by the QT tile: covers qt=4
        rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
        coeff = rng.random((nq, s)).astype(np.float32) * 1.5
        coeff[2, 1] = 0.0  # a missing slot
        scale = float(np.float32(2.0**16))
        clip = float(np.float32(65075262.0))
        found = coeff > 0
        nb = block_plan(indptr, rows, found, block=blocksize)
        # gather-path reference
        c = total_cap(indptr, rows, found)
        pd = np.concatenate(
            [post_doc, np.full(blocksize, n_docs, np.int32)]
        )
        pv = np.concatenate([post_val, np.zeros(blocksize, np.float32)])
        ref = search_packed(
            jnp.asarray(indptr), jnp.asarray(pd), jnp.asarray(pv),
            jnp.asarray(rows), jnp.asarray(coeff),
            jnp.float32(scale), jnp.float32(clip), jnp.int32(50),
            c_total=c, k=10, n_docs=n_docs,
        )
        got = fused_search(
            jnp.asarray(d2), jnp.asarray(v2), row_start, indptr,
            rows, coeff, doc_base=50, n_blocks=nb, block=blocksize,
            k=10, n_docs=n_docs, scale=scale, clip=clip, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got[0]), np.asarray(ref[0]), f"vals blk={blocksize}"
        )
        np.testing.assert_array_equal(
            np.asarray(got[1]), np.asarray(ref[1]), f"gids blk={blocksize}"
        )
        # large-k: the region-parallel bitonic-tournament path (k > 16)
        # under query stacking must also match (nq=8 pow2 -> stacked)
        ref64 = search_packed(
            jnp.asarray(indptr), jnp.asarray(pd), jnp.asarray(pv),
            jnp.asarray(rows), jnp.asarray(coeff),
            jnp.float32(scale), jnp.float32(clip), jnp.int32(50),
            c_total=c, k=64, n_docs=n_docs,
        )
        got64 = fused_search(
            jnp.asarray(d2), jnp.asarray(v2), row_start, indptr,
            rows, coeff, doc_base=50, n_blocks=nb, block=blocksize,
            k=64, n_docs=n_docs, scale=scale, clip=clip, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got64[0]), np.asarray(ref64[0]), f"v64 {blocksize}"
        )
        np.testing.assert_array_equal(
            np.asarray(got64[1]), np.asarray(ref64[1]), f"g64 {blocksize}"
        )


def test_fused_compaction_fuzz():
    """Compacted candidate buffers (dstrow plan + r_c bound) under query
    stacking: queries with wildly different real-postings needs share
    one bucket, so per-query compaction offsets differ, the r_c buffer
    bound is exercised at its tightest, and (nq=8, a power of two, so
    pick_stack stacks the whole bucket) a fully-empty query sits inside
    a stacked program — the preceding query's static store-width
    overhang must leave only masked sentinels in its region. seed 9
    additionally runs k=17, the extraction->tournament boundary, through
    the regionized bitonic tournament. Must equal the gather-path
    reference bit-for-bit."""
    for seed in (7, 8, 9):
        rng = np.random.default_rng(seed)
        n_terms, n_docs = 30, 5000
        indptr, post_doc, post_val, nnz = _csr(rng, n_terms, n_docs, 3000)
        d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
        nq, s, blocksize = 8, 4, 1024
        rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
        coeff = rng.random((nq, s)).astype(np.float32) * 1.5
        # heavy missing-slot mix: some queries nearly empty
        coeff[rng.random((nq, s)) < 0.4] = 0.0
        coeff[0] = 0.0  # fully empty query stacked between real ones
        coeff[5] = 0.0
        scale = float(np.float32(2.0**16))
        clip = float(np.float32(65075262.0))
        found = coeff > 0
        nb = block_plan(indptr, rows, found, block=blocksize)
        c = total_cap(indptr, rows, found)
        pd = np.concatenate(
            [post_doc, np.full(blocksize, n_docs, np.int32)]
        )
        pv = np.concatenate([post_val, np.zeros(blocksize, np.float32)])
        k = 17 if seed == 9 else 10
        ref = search_packed(
            jnp.asarray(indptr), jnp.asarray(pd), jnp.asarray(pv),
            jnp.asarray(rows), jnp.asarray(coeff),
            jnp.float32(scale), jnp.float32(clip), jnp.int32(0),
            c_total=c, k=k, n_docs=n_docs,
        )
        got = fused_search(
            jnp.asarray(d2), jnp.asarray(v2), row_start, indptr,
            rows, coeff, doc_base=0, n_blocks=nb, block=blocksize,
            k=k, n_docs=n_docs, scale=scale, clip=clip, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got[0]), np.asarray(ref[0]), f"vals seed={seed}"
        )
        np.testing.assert_array_equal(
            np.asarray(got[1]), np.asarray(ref[1]), f"gids seed={seed}"
        )


def test_fused_single_row_regions_large_k():
    """Regression (review finding): k>16 with single-granule-row regions
    (every slot tiny -> fused_search's tightest r_c is 1) under query
    stacking. The regionized tournament has no normalizing final round
    when region_rows == 1, so stage A must sort every row descending —
    the original alternating-by-row-parity direction left odd stacked
    queries ascending and extraction returned all (-1, -1)."""
    rng = np.random.default_rng(11)
    n_terms, n_docs = 12, 4000
    lens = rng.integers(20, 100, n_terms)  # rows all <= 100 postings
    indptr64 = np.zeros(n_terms + 1, np.int64)
    np.cumsum(lens, out=indptr64[1:])
    nnz = int(indptr64[-1])
    parts = [
        np.sort(rng.choice(n_docs, size=l, replace=False).astype(np.int32))
        for l in lens
    ]
    post_doc = np.concatenate(parts)
    post_val = rng.random(nnz, dtype=np.float32) * 0.9 + 0.05
    indptr = indptr64.astype(np.int32)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    nq, s, blocksize, k = 4, 1, 2048, 20
    rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
    coeff = rng.random((nq, s)).astype(np.float32) * 1.5 + 0.1
    scale = float(np.float32(2.0**16))
    clip = float(np.float32(65075262.0))
    nb = block_plan(indptr, rows, coeff > 0, block=blocksize)
    c = total_cap(indptr, rows, coeff > 0)
    pd = np.concatenate([post_doc, np.full(blocksize, n_docs, np.int32)])
    pv = np.concatenate([post_val, np.zeros(blocksize, np.float32)])
    ref = search_packed(
        jnp.asarray(indptr), jnp.asarray(pd), jnp.asarray(pv),
        jnp.asarray(rows), jnp.asarray(coeff),
        jnp.float32(scale), jnp.float32(clip), jnp.int32(0),
        c_total=c, k=k, n_docs=n_docs,
    )
    got = fused_search(
        jnp.asarray(d2), jnp.asarray(v2), row_start, indptr, rows, coeff,
        doc_base=0, n_blocks=nb, block=blocksize, k=k, n_docs=n_docs,
        scale=scale, clip=clip, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_fused_kernel_empty_and_missing_slots():
    rng = np.random.default_rng(43)
    n_terms, n_docs = 8, 300
    indptr, post_doc, post_val, nnz = _csr(rng, n_terms, n_docs, 200)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    nq, s, blocksize = 3, 2, 256
    rows = np.zeros((nq, s), np.int32)
    coeff = np.zeros((nq, s), np.float32)
    coeff[0, 0] = 1.0  # one active slot; rows 1-2 fully empty
    nb = block_plan(indptr, rows, coeff > 0, block=blocksize)
    scale = float(np.float32(2.0**16))
    clip = float(np.float32(65075262.0))
    vals, gids = fused_search(
        jnp.asarray(d2), jnp.asarray(v2), row_start, indptr, rows,
        coeff, doc_base=0, n_blocks=nb, block=blocksize, k=5,
        n_docs=n_docs, scale=scale, clip=clip, interpret=True,
    )
    vals, gids = np.asarray(vals), np.asarray(gids)
    assert (vals[1:] == -1).all() and (gids[1:] == -1).all()
    assert (vals[0] > 0).any()
    # plan-table twin agrees
    sr, rm, ab, _dst = plan_tables(
        row_start, indptr, rows, coeff, nb, blocksize
    )
    tv, tg = search_packed_tables(
        jnp.asarray(d2), jnp.asarray(v2), jnp.asarray(sr),
        jnp.asarray(rm), jnp.asarray(ab), jnp.float32(scale),
        jnp.float32(clip), jnp.int32(0), n_blocks=nb, block=blocksize,
        s=s, k=5, n_docs=n_docs,
    )
    np.testing.assert_array_equal(vals, np.asarray(tv))
    np.testing.assert_array_equal(gids, np.asarray(tg))


def test_fused_merge_flip_stacked_regions():
    """MERGE_FLIP=True through the FUSED stacked path (q_regions > 1):
    the mirror half-cleaner's group flips must stay inside each stacked
    query's region (level <= c_region, both pow-2 aligned) — run the
    compaction fuzz shape with empty queries stacked between real ones
    and pin bit-identity against the gather-path reference."""
    import jax

    from document_search_engine_tpu.ops import rank_pallas as rp

    rng = np.random.default_rng(7)
    n_terms, n_docs = 30, 5000
    indptr, post_doc, post_val, nnz = _csr(rng, n_terms, n_docs, 3000)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    nq, s, blocksize = 8, 4, 1024
    rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
    coeff = rng.random((nq, s)).astype(np.float32) * 1.5
    coeff[rng.random((nq, s)) < 0.4] = 0.0
    coeff[0] = 0.0
    scale = float(np.float32(2.0**16))
    clip = float(np.float32(65075262.0))
    nb = block_plan(indptr, rows, coeff > 0, block=blocksize)
    c = total_cap(indptr, rows, coeff > 0)
    pd = np.concatenate([post_doc, np.full(blocksize, n_docs, np.int32)])
    pv = np.concatenate([post_val, np.zeros(blocksize, np.float32)])
    ref = search_packed(
        jnp.asarray(indptr), jnp.asarray(pd), jnp.asarray(pv),
        jnp.asarray(rows), jnp.asarray(coeff),
        jnp.float32(scale), jnp.float32(clip), jnp.int32(0),
        c_total=c, k=10, n_docs=n_docs,
    )
    saved = rp.MERGE_FLIP
    try:
        rp.MERGE_FLIP = True
        jax.clear_caches()  # MERGE_FLIP is a trace-time global
        got = fused_search(
            jnp.asarray(d2), jnp.asarray(v2), row_start, indptr,
            rows, coeff, doc_base=0, n_blocks=nb, block=blocksize,
            k=10, n_docs=n_docs, scale=scale, clip=clip, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    finally:
        rp.MERGE_FLIP = saved
        jax.clear_caches()


def test_fused_unique_keys_parity():
    """UNIQUE_KEYS (tie-free merge via (doc << kb) | slot candidate
    keys) must be bit-identical to the tie-safe path and to the XLA
    gather reference, across every scheme combo: the default classic
    network, the flip scheme, and k=17 (the tournament boundary, which
    runs on recovered doc ids). Queries deliberately repeat the same
    term row in two slots so equal docs with DIFFERENT ci payloads hit
    the merge — the exact case the tie-consistency term protected."""
    import jax

    from document_search_engine_tpu.ops import fused_pallas as fp
    from document_search_engine_tpu.ops import rank_pallas as rp

    rng = np.random.default_rng(17)
    n_terms, n_docs = 24, 4000
    indptr, post_doc, post_val, nnz = _csr(rng, n_terms, n_docs, 2000)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    nq, s, blocksize = 8, 4, 512
    rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
    rows[:, 2] = rows[:, 0]  # duplicate term row => guaranteed doc ties
    coeff = rng.random((nq, s)).astype(np.float32) * 1.5 + 0.05
    scale = float(np.float32(2.0**16))
    clip = float(np.float32(65075262.0))
    nb = block_plan(indptr, rows, coeff > 0, block=blocksize)
    c = total_cap(indptr, rows, coeff > 0)
    pd = np.concatenate([post_doc, np.full(blocksize, n_docs, np.int32)])
    pv = np.concatenate([post_val, np.zeros(blocksize, np.float32)])
    saved_uk, saved_flip = fp.UNIQUE_KEYS, rp.MERGE_FLIP
    try:
        for k in (10, 17):
            ref = search_packed(
                jnp.asarray(indptr), jnp.asarray(pd), jnp.asarray(pv),
                jnp.asarray(rows), jnp.asarray(coeff),
                jnp.float32(scale), jnp.float32(clip), jnp.int32(0),
                c_total=c, k=k, n_docs=n_docs,
            )
            for uk, flip in (
                (True, False), (False, False), (True, True)
            ):
                fp.UNIQUE_KEYS, rp.MERGE_FLIP = uk, flip
                jax.clear_caches()  # both are trace-time globals
                got = fused_search(
                    jnp.asarray(d2), jnp.asarray(v2), row_start, indptr,
                    rows, coeff, doc_base=0, n_blocks=nb,
                    block=blocksize, k=k, n_docs=n_docs, scale=scale,
                    clip=clip, interpret=True,
                )
                np.testing.assert_array_equal(
                    np.asarray(got[0]), np.asarray(ref[0]),
                    f"vals uk={uk} flip={flip} k={k}",
                )
                np.testing.assert_array_equal(
                    np.asarray(got[1]), np.asarray(ref[1]),
                    f"gids uk={uk} flip={flip} k={k}",
                )
    finally:
        fp.UNIQUE_KEYS, rp.MERGE_FLIP = saved_uk, saved_flip
        jax.clear_caches()
