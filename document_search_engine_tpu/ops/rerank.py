"""Hybrid retrieval: dense-embedding rerank of lexical candidates
(BASELINE.json:11 "BM25 candidate gen + dense-embedding Pallas rerank").

Embeddings are deterministic feature-hash projections of each doc's
materialized impact profile: posting (term t, doc d, val v) contributes
`v * sign(t)` to column `col(t) = (hash(t) >> 8) % dim`, with
`sign(t) = +-1` from hash bit 40 — no training, no floats shipped from
outside the index, and the same projection applied to the query's slot
coefficients. Rows are L2-normalized, so the rerank score is a cosine.

Scores are quantized to int32 (round-half-even, 2^scale_bits) and ranked
(rerank desc, lexical score desc, gid asc) — deterministic like the rest
of the stack (DESIGN.md §2). The candidate dot products run as a Pallas
MXU kernel (interpret=True on CPU), with an identical jnp reference
(tested equal).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

F32 = np.float32


def term_projection(term_hash: np.ndarray, dim: int):
    """(col int32, sign f32) per vocab term from its 64-bit hash."""
    col = ((term_hash >> np.uint64(8)) % np.uint64(dim)).astype(np.int32)
    sign = np.where(
        (term_hash >> np.uint64(40)) & np.uint64(1), F32(-1.0), F32(1.0)
    )
    return col, sign


def doc_embeddings(
    term_hash: np.ndarray,
    indptr: np.ndarray,
    post_doc: np.ndarray,
    post_val: np.ndarray,
    n_docs: int,
    dim: int,
) -> np.ndarray:
    """(n_docs, dim) f32 L2-normalized feature-hash embeddings (host)."""
    col, sign = term_projection(term_hash, dim)
    nnz = int(indptr[-1])
    row_of = np.repeat(
        np.arange(len(term_hash), dtype=np.int64),
        np.diff(indptr).astype(np.int64),
    )
    emb = np.zeros((n_docs, dim), dtype=F32)
    np.add.at(
        emb,
        (post_doc[:nnz].astype(np.int64), col[row_of]),
        post_val[:nnz] * sign[row_of],
    )
    norms = np.sqrt((emb.astype(np.float64) ** 2).sum(axis=1))
    norms = np.where(norms == 0, 1.0, norms).astype(F32)
    return emb / norms[:, None]


def query_embeddings(
    slot_h: np.ndarray, coeff: np.ndarray, dim: int
) -> np.ndarray:
    """(nq, dim) f32 normalized query projections from slot coefficients."""
    nq = slot_h.shape[0]
    emb = np.zeros((nq, dim), dtype=F32)
    col, sign = term_projection(slot_h.reshape(-1), dim)
    col = col.reshape(slot_h.shape)
    sign = sign.reshape(slot_h.shape)
    for s in range(slot_h.shape[1]):
        np.add.at(
            emb,
            (np.arange(nq), col[:, s]),
            coeff[:, s] * sign[:, s],
        )
    norms = np.sqrt((emb.astype(np.float64) ** 2).sum(axis=1))
    norms = np.where(norms == 0, 1.0, norms).astype(F32)
    return emb / norms[:, None]


def _rerank_kernel(q_ref, c_ref, out_ref):
    # q: (1, E), c: (1, K, E) -> out (1, K): candidate dots on the MXU
    q = q_ref[0]  # (E,)
    c = c_ref[0]  # (K, E)
    out_ref[0, :] = jax.lax.dot_general(
        c,
        q[:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0]


@partial(jax.jit, static_argnames=("interpret",))
def rerank_dots_pallas(
    qemb: jnp.ndarray,  # (nq, E) f32
    cand_emb: jnp.ndarray,  # (nq, K, E) f32
    interpret: bool = False,
) -> jnp.ndarray:
    """(nq, K) f32 cosine scores, one query per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nq, kk, e = cand_emb.shape
    return pl.pallas_call(
        _rerank_kernel,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((1, e), lambda q: (q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, kk, e), lambda q: (q, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kk), lambda q: (q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, kk), jnp.float32),
        interpret=interpret,
    )(qemb, cand_emb)


def rerank_dots_ref(qemb: jnp.ndarray, cand_emb: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum(
        "qe,qke->qk", qemb, cand_emb, preferred_element_type=jnp.float32
    )


def rerank_order(
    dots: np.ndarray,  # (nq, K) f32 rerank scores
    lex_vals: np.ndarray,  # (nq, K) int lexical scores (-1 = dead)
    gids: np.ndarray,  # (nq, K) int
    k: int,
    scale_bits: int = 20,
):
    """Final ranked (ids, rerank_int, lex) by (rerank desc, lex desc,
    gid asc); dead candidates sink. Quantization keeps it deterministic."""
    ri = np.rint(
        np.asarray(dots, dtype=F32) * F32(float(2.0**scale_bits))
    ).astype(np.int64)
    ri = np.where(lex_vals > 0, ri, np.int64(-(2**40)))
    order = np.lexsort(
        (gids, -np.asarray(lex_vals, np.int64), -ri), axis=-1
    )[:, :k]
    out_ids = np.take_along_axis(gids, order, axis=1)
    out_ri = np.take_along_axis(ri, order, axis=1)
    out_lex = np.take_along_axis(np.asarray(lex_vals, np.int64), order, axis=1)
    dead = out_lex <= 0
    out_ids = np.where(dead, -1, out_ids)
    out_ri = np.where(dead, -1, out_ri)
    out_lex = np.where(dead, -1, out_lex)
    return out_ids, out_ri, out_lex
