"""Top-k ranking semantics: tie-stability contract and implementation
equivalence (the lax.top_k fast path must exactly match the two-key-sort
reference on tie-heavy inputs)."""
import jax
import jax.numpy as jnp
import numpy as np

from document_search_engine_tpu.ops.topk import (
    merge_candidates,
    topk_ranked,
    topk_ranked_sort,
)


def test_topk_tie_stability():
    """Pin the backend contract topk_ranked relies on: lax.top_k returns
    lower indices first among equal values."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 5, size=(8, 2048)).astype(np.int32)
    _, idx = jax.lax.top_k(jnp.asarray(x), 64)
    idx = np.asarray(idx)
    for r in range(8):
        expect = np.lexsort((np.arange(2048), -x[r]))[:64]
        np.testing.assert_array_equal(idx[r], expect)


def test_topk_ranked_matches_sort_reference():
    rng = np.random.default_rng(1)
    for trial in range(3):
        d = 512
        scores = rng.integers(0, 4, size=(6, d)).astype(np.int32)
        alive = rng.random(d) > 0.3
        doc_ids = (np.arange(d) + 1000).astype(np.int32)  # ascending
        for k in (1, 10, 600):
            a = topk_ranked(
                jnp.asarray(scores), jnp.asarray(alive), jnp.asarray(doc_ids), k=k
            )
            b = topk_ranked_sort(
                jnp.asarray(scores), jnp.asarray(alive), jnp.asarray(doc_ids), k=k
            )
            np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_merge_candidates_order():
    vals = jnp.asarray([[5, 2, -1, 5, 3, 2]], dtype=jnp.int32)
    gids = jnp.asarray([[40, 10, -1, 7, 99, 3]], dtype=jnp.int32)
    v, g = merge_candidates(vals, gids, k=5)
    # (5,7) before (5,40); dead candidate sinks
    np.testing.assert_array_equal(np.asarray(v)[0], [5, 5, 3, 2, 2])
    np.testing.assert_array_equal(np.asarray(g)[0], [7, 40, 99, 3, 10])
