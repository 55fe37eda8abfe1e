"""Top-k ranking and candidate merge (DESIGN.md §5).

Ranking order is (score desc, doc id asc) — implemented as a two-key
lexicographic `lax.sort` on (-score, id), which is exact on every backend
(plain `lax.top_k` tie order is not guaranteed on all backends). The Pallas
per-shard partial top-k (ops/topk_pallas.py) replaces the full sort on the
hot path; this module remains the reference and the merge step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def topk_ranked(
    scores: jnp.ndarray,  # (nq, D) int32
    alive: jnp.ndarray,  # (D,) bool
    doc_ids: jnp.ndarray,  # (D,) int32 — global ids of the columns
    k: int,
):
    """Per-shard/segment top-k: (vals (nq,k) int32, gids (nq,k) int32).

    Dead/padded docs score -1 and their gid is masked to -1 in the output.
    """
    nq, d = scores.shape
    masked = jnp.where(alive[None, :], scores, -1)
    neg = -masked
    ids_b = jnp.broadcast_to(doc_ids[None, :], (nq, d))
    neg_sorted, ids_sorted = jax.lax.sort(
        (neg, ids_b), dimension=1, num_keys=2
    )
    kk = min(k, d)
    vals = -neg_sorted[:, :kk]
    gids = ids_sorted[:, :kk]
    gids = jnp.where(vals < 0, -1, gids)
    if kk < k:
        pad_v = jnp.full((nq, k - kk), -1, scores.dtype)
        pad_g = jnp.full((nq, k - kk), -1, gids.dtype)
        vals = jnp.concatenate([vals, pad_v], axis=1)
        gids = jnp.concatenate([gids, pad_g], axis=1)
    return vals, gids


@partial(jax.jit, static_argnames=("k",))
def merge_candidates(vals: jnp.ndarray, gids: jnp.ndarray, k: int):
    """Merge (nq, n_candidates) ranked candidates from several shards or
    segments into one global top-k, same (score desc, id asc) order.

    This is the host-visible half of the all-gather merge over ICI
    (BASELINE.json:5); inputs are the concatenated per-shard candidates.
    """
    neg = -vals
    # Dead candidates (val -1, gid -1) sort last on -val=1; keep gid order
    # stable by sorting ids as the secondary key.
    neg_sorted, ids_sorted = jax.lax.sort(
        (neg, gids), dimension=1, num_keys=2
    )
    kk = min(k, vals.shape[1])
    out_v = -neg_sorted[:, :kk]
    out_g = jnp.where(out_v < 0, -1, ids_sorted[:, :kk])
    return out_v, out_g
