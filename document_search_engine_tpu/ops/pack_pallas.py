"""Pallas TPU kernel: pack CSR posting ranges via contiguous DMA.

The packing stage of the search step reads, for each query slot, a
*contiguous* range post[start : start+len] — but expressing it as a gather
(`post[idx]`) makes XLA issue element-wise random loads (measured ~106M
elements/s on this TPU ≈ 0.4 GB/s). This kernel instead issues one DMA per
fixed-size block of the range, hitting HBM at streaming bandwidth.

Layout: postings are interleaved records `post_rec (nnz_pad, 2) int32` =
[doc_id, bitcast(val_f32)], so doc and value arrive in a single DMA.

Host/XLA side precomputes a tiny per-(query, block) source table
(block-aligned destination regions per slot); the kernel is a grid over
queries, each program firing up to DEPTH overlapped DMAs into its VMEM
output block (double-buffered waits), with the source offsets scalar-
prefetched into SMEM (pltpu.PrefetchScalarGridSpec).

Padding blocks (src < 0) are skipped; their lanes are masked downstream by
the same (cum, len) arithmetic used for addressing (ops/packed.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048  # postings per DMA block (8 KB doc+val)
DEPTH = 4  # DMAs in flight per program


def interleave_postings(post_doc, post_val) -> jnp.ndarray:
    """(nnz_pad, 2) int32 records [doc, bitcast(val)]."""
    import numpy as _np

    d = _np.asarray(post_doc, dtype=_np.int32)
    v = _np.asarray(post_val, dtype=_np.float32).view(_np.int32)
    return jnp.asarray(_np.stack([d, v], axis=1))


def block_plan(indptr: np.ndarray, rows: np.ndarray, found: np.ndarray,
               block: int = BLOCK):
    """Static n_blocks for a batch: max per-query sum of ceil(len/B),
    pow-2 bucketed."""
    if len(indptr) < 2 or rows.size == 0:
        return 1
    lens = (indptr[rows + 1] - indptr[rows]) * found
    nblk = -(-lens // block)  # ceil
    m = int(nblk.sum(axis=1).max())
    return max(1, 1 << int(np.ceil(np.log2(max(m, 1)))))


def _src_table(starts, lens, n_blocks: int, block: int, nnz_pad: int):
    """(nq, n_blocks) int32 DMA source offsets (-1 = skip), plus the
    block-aligned per-slot cum offsets (nq, S+1) for downstream masking.
    Pure elementwise XLA over (nq, S) and (nq, n_blocks): cheap."""
    nq, s = starts.shape
    nblk = -(-lens // block)  # (nq, S)
    blk_cum = jnp.concatenate(
        [jnp.zeros((nq, 1), nblk.dtype), jnp.cumsum(nblk, axis=1)], axis=1
    )
    j = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]  # (1, NB)
    src = jnp.full((nq, n_blocks), -1, jnp.int32)
    for t in range(s):
        in_t = (j >= blk_cum[:, t : t + 1]) & (j < blk_cum[:, t + 1 : t + 2])
        off = (j - blk_cum[:, t : t + 1]) * block
        src_t = starts[:, t : t + 1] + off
        src = jnp.where(in_t, src_t, src)
    # clamp so src+BLOCK stays in bounds (tail blocks read past the row;
    # those lanes are masked downstream)
    src = jnp.where(src >= 0, jnp.minimum(src, nnz_pad - block), src)
    return src, blk_cum


def _pack_kernel(src_ref, rec_ref, out_ref, sems):
    q = pl.program_id(0)
    n_blocks = out_ref.shape[0] // BLOCK

    def get_dma(j):
        src = src_ref[q, j]
        return pltpu.make_async_copy(
            rec_ref.at[pl.ds(src, BLOCK), :],
            out_ref.at[pl.ds(j * BLOCK, BLOCK), :],
            sems.at[j % DEPTH],
        )

    def start(j):
        @pl.when(src_ref[q, j] >= 0)
        def _():
            get_dma(j).start()

    def wait(j):
        @pl.when(src_ref[q, j] >= 0)
        def _():
            get_dma(j).wait()

        @pl.when(src_ref[q, j] < 0)
        def _():
            out_ref[pl.ds(j * BLOCK, BLOCK), :] = jnp.zeros(
                (BLOCK, 2), jnp.int32
            )

    for j in range(min(DEPTH, n_blocks)):
        start(j)
    for j in range(n_blocks):
        wait(j)
        nxt = j + DEPTH
        if nxt < n_blocks:
            start(nxt)


@partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def pack_postings_pallas(
    post_rec: jnp.ndarray,  # (nnz_pad, 2) int32 records
    src: jnp.ndarray,  # (nq, n_blocks) int32 DMA sources (-1 skip)
    n_blocks: int,
    interpret: bool = False,
):
    """(nq, n_blocks*BLOCK, 2) packed records (junk where src=-1 or past
    row end — mask downstream)."""
    nq = src.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, n_blocks * BLOCK, 2),
            lambda q, src_ref: (q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )

    def kernel(src_ref, rec_ref, out_ref, sems):
        _pack_kernel(src_ref, rec_ref, out_ref.at[0], sems)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, n_blocks * BLOCK, 2), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src, post_rec)


def pack_reference(post_rec, src, n_blocks: int):
    """XLA reference of the pack (for kernel tests): same junk-lane
    semantics (src=-1 blocks produce zeros; tails read real memory)."""
    nq = src.shape[0]
    j = jnp.arange(n_blocks * BLOCK, dtype=jnp.int32)[None, :]
    blk = j // BLOCK
    src_b = jnp.take_along_axis(src, blk, axis=1)
    idx = src_b + (j % BLOCK)
    ok = src_b >= 0
    idx = jnp.where(ok, idx, 0)
    out = post_rec[idx]
    return jnp.where(ok[..., None], out, 0)
