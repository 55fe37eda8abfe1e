"""Pallas DMA packing kernel vs XLA reference (interpret mode on CPU,
SURVEY.md §4 "kernel tests")."""
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.ops.pack_pallas import (
    BLOCK,
    _src_table,
    block_plan,
    interleave_postings,
    pack_postings_pallas,
    pack_reference,
)


def test_src_table_and_plan():
    indptr = np.array([0, 10, 10, 5000, 5100], np.int32)
    rows = np.array([[0, 2], [3, 1]], np.int32)
    found = np.ones((2, 2), bool)
    nb = block_plan(indptr, rows, found)
    starts = jnp.asarray(indptr[rows])
    lens = jnp.asarray(indptr[rows + 1] - indptr[rows])
    src, blk_cum = _src_table(starts, lens, nb, BLOCK, nnz_pad=8192)
    src = np.asarray(src)
    # q0: row0 len10 -> 1 block at 0; row2 len4990 -> 3 blocks at 10,
    # 10+2048, 10+4096 (clamped to nnz_pad-BLOCK)
    assert src[0, 0] == 0
    assert src[0, 1] == 10
    assert src[0, 2] == 10 + BLOCK
    assert src[0, 3] == min(10 + 2 * BLOCK, 8192 - BLOCK)
    # q1: row3 len100 -> 1 block at 5000; row1 len0 -> none; rest -1
    assert src[1, 0] == 5000
    assert (src[1, 1:] == -1).all()


def test_pack_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    nnz = 4 * BLOCK
    post_doc = rng.integers(0, 1000, nnz).astype(np.int32)
    post_val = rng.random(nnz, dtype=np.float32)
    rec = interleave_postings(post_doc, post_val)
    nq, nb = 3, 4
    src = np.array(
        [
            [0, BLOCK, -1, -1],
            [5, 2 * BLOCK + 7, 3 * BLOCK, -1],
            [-1, -1, -1, -1],
        ],
        np.int32,
    )
    out = pack_postings_pallas(rec, jnp.asarray(src), n_blocks=nb, interpret=True)
    ref = pack_reference(rec, jnp.asarray(src), nb)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # values decode back to the exact f32 bits
    got_v = np.asarray(out)[1, : BLOCK, 1].view(np.float32)
    np.testing.assert_array_equal(got_v, post_val[5 : 5 + BLOCK])
