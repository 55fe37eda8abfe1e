"""The fused Pallas rank kernel must equal the XLA rank_candidates tail
bit-for-bit on block-run-sorted inputs (interpret mode on CPU; the same
comparison runs on hardware in test_tpu_smoke.py)."""
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.ops.packed import rank_candidates
from document_search_engine_tpu.ops.rank_pallas import (
    rank_candidates_pallas,
)


def make_block_sorted_rows(
    rng, nq, n_blocks, block, n_docs, s, fill_frac=0.7
):
    """(d_key, ci) (nq, n_blocks*block) i32 rows where every aligned
    `block`-run is doc-ascending with a sentinel tail, each doc appears
    <= s times per row, and blocks beyond the first s are empty (mirrors
    the <= 1-occurrence-per-slot production invariant)."""
    c = n_blocks * block
    d = np.full((nq, c), n_docs, np.int32)
    ci = np.zeros((nq, c), np.int32)
    for q in range(nq):
        used = {}
        for b in range(min(n_blocks, s)):
            n_valid = int(rng.integers(0, int(block * fill_frac) + 1))
            # sample docs not yet used s times
            docs = rng.choice(n_docs, size=min(n_valid, n_docs), replace=False)
            docs = np.sort(docs.astype(np.int32))
            lo = b * block
            d[q, lo : lo + len(docs)] = docs
            vals = rng.integers(0, 50, len(docs)).astype(np.int32)
            # some zero contributions (quantized-to-zero)
            vals[rng.random(len(docs)) < 0.1] = 0
            ci[q, lo : lo + len(docs)] = vals
            for dd in docs.tolist():
                used[dd] = used.get(dd, 0) + 1
    return d, ci


def test_rank_pallas_matches_rank_candidates():
    rng = np.random.default_rng(17)
    for n_blocks, block, s, n_docs in (
        (4, 256, 4, 500),
        (8, 256, 8, 120),
        (2, 512, 2, 3000),
        (1, 256, 3, 50),
    ):
        d, ci = make_block_sorted_rows(
            rng, nq=6, n_blocks=n_blocks, block=block, n_docs=n_docs, s=s
        )
        for k in (1, 10, 64):
            ref = rank_candidates(
                jnp.asarray(d), jnp.asarray(ci), jnp.int32(1000),
                s, k, n_docs,
            )
            got = rank_candidates_pallas(
                jnp.asarray(d), jnp.asarray(ci), jnp.int32(1000),
                block=block, s=s, k=k, n_docs=n_docs, interpret=True,
            )
            np.testing.assert_array_equal(
                np.asarray(got[0]), np.asarray(ref[0]),
                err_msg=f"vals nb={n_blocks} blk={block} k={k}",
            )
            np.testing.assert_array_equal(
                np.asarray(got[1]), np.asarray(ref[1]),
                err_msg=f"gids nb={n_blocks} blk={block} k={k}",
            )


def test_rank_pallas_ties_and_empty():
    """Score ties must break by ascending doc id; empty rows are all -1."""
    block, s, n_docs = 256, 4, 100
    c = 2 * block
    d = np.full((3, c), n_docs, np.int32)
    ci = np.zeros((3, c), np.int32)
    # row 0: docs 7 and 3 tie at 5 (3 must rank first); doc 9 scores 8
    d[0, :3] = [3, 7, 9]
    ci[0, :3] = [5, 5, 8]
    # row 1: same doc in both blocks sums across runs
    d[1, 0], ci[1, 0] = 42, 4
    d[1, block], ci[1, block] = 42, 6
    # row 2: empty
    ref = rank_candidates(
        jnp.asarray(d), jnp.asarray(ci), jnp.int32(0), s, 5, n_docs
    )
    got = rank_candidates_pallas(
        jnp.asarray(d), jnp.asarray(ci), jnp.int32(0),
        block=block, s=s, k=5, n_docs=n_docs, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    g = np.asarray(got[1])
    assert list(g[0][:3]) == [9, 3, 7]
    assert g[1][0] == 42 and np.asarray(got[0])[1][0] == 10
    assert (g[2] == -1).all()


def test_search_packed_ds_with_rank_pallas():
    """End-to-end: search_packed_ds(use_rank_pallas=True) equals the XLA
    rank path bit-for-bit on randomized CSR inputs."""
    from document_search_engine_tpu.ops.packed import search_packed_ds
    from document_search_engine_tpu.ops.schedule import block_plan
    from test_packed import make_aligned

    rng = np.random.default_rng(29)
    n_terms, n_docs = 25, 3000
    lens = rng.integers(1, 2000, n_terms)
    indptr64 = np.zeros(n_terms + 1, np.int64)
    np.cumsum(lens, out=indptr64[1:])
    nnz = int(indptr64[-1])
    # production CSR rows have UNIQUE ascending docs per term (the builder
    # aggregates tf per (term, doc)) — the <= s occurrences-per-row
    # invariant both rank implementations rely on follows from it
    parts = [
        np.sort(
            rng.choice(n_docs, size=l, replace=False).astype(np.int32)
        )
        for l in lens
    ]
    post_doc = np.concatenate(parts)
    post_val = rng.random(nnz, dtype=np.float32) * 0.9 + 0.05
    indptr = indptr64.astype(np.int32)
    d2, v2, row_start = make_aligned(indptr, post_doc, post_val, n_docs)
    for blocksize in (256, 512):
        nq, s = 5, 3
        rows = rng.integers(0, n_terms, (nq, s)).astype(np.int32)
        coeff = rng.random((nq, s)).astype(np.float32) * 1.5
        coeff[1, 1] = 0.0
        scale, clip = jnp.float32(2.0**16), jnp.float32(65075262)
        nb = block_plan(indptr, rows, coeff > 0, block=blocksize)
        args = (
            jnp.asarray(d2), jnp.asarray(v2), jnp.asarray(indptr),
            jnp.asarray(row_start), jnp.asarray(rows),
            jnp.asarray(coeff), scale, clip, jnp.int32(100),
        )
        kw = dict(n_blocks=nb, k=10, n_docs=n_docs, block=blocksize)
        ref = search_packed_ds(*args, **kw)
        got = search_packed_ds(
            *args, **kw, use_rank_pallas=True, rank_interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_merge_flip_schemes_identical():
    """The flip-first mirror-half-cleaner merge and the classic
    reverse-odd-runs bitonic network must produce bit-identical ranked
    output (stage 2/3 are order-free once the buffer is sorted)."""
    from document_search_engine_tpu.ops import rank_pallas as rp

    rng = np.random.default_rng(41)
    d, ci = make_block_sorted_rows(
        rng, nq=8, n_blocks=8, block=256, n_docs=400, s=8
    )
    saved = rp.MERGE_FLIP
    try:
        outs = {}
        for flip in (False, True):
            rp.MERGE_FLIP = flip
            # MERGE_FLIP is read at trace time and is not part of the
            # jit cache key — drop cached traces so each scheme is
            # actually traced (same reason tools/step_ab.py clears)
            import jax

            jax.clear_caches()
            outs[flip] = rank_candidates_pallas(
                jnp.asarray(d), jnp.asarray(ci), jnp.int32(7),
                block=256, s=8, k=10, n_docs=400, interpret=True,
            )
        np.testing.assert_array_equal(
            np.asarray(outs[False][0]), np.asarray(outs[True][0])
        )
        np.testing.assert_array_equal(
            np.asarray(outs[False][1]), np.asarray(outs[True][1])
        )
    finally:
        rp.MERGE_FLIP = saved
