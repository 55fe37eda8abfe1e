"""Pallas TPU kernel: fused search step over an interleaved doc|val
plane — ONE DMA per block instead of two.

The round-4 roofline (tools/roofline.py, ROADMAP table) measured the
fused kernel's DMA phase TRANSACTION-bound: ~134 ns per DMA at only
8-15% of HBM bandwidth, with two DMAs (doc plane + val plane) issued
and waited per (query, block). This variant stores postings as one
(X, 256) int32 plane — lanes [0, 128) hold the doc keys, lanes
[128, 256) the bitcast-f32 values, row for row — so each block costs a
single contiguous (block/128, 256) DMA and a single semaphore wait.
The VMEM split back into doc/val halves is a tile-aligned lane slice
(lane tiles are 128 wide): pure addressing, no shuffles, no extra
passes. Plan tables, compaction, stacking and the whole rank pipeline
are IDENTICAL to ops/fused_pallas.py (same srcrow row offsets — the
dv plane has the same row indexing, just 256 lanes per row).

The dv plane is derived ON DEVICE from the resident doc/val planes
(`interleave_planes`, one jit concat) so index layout, checkpoints and
every other consumer of (X, 128) planes are untouched.

Bit-identical to fused_search_pallas on the same plan — gated by
tests/test_fused_dv.py in interpret mode and the TPU smoke suite on
hardware.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_pallas import DEPTH
from .rank_pallas import LANES, merge_rank_body


@jax.jit
def interleave_planes(post_doc: jnp.ndarray, post_val: jnp.ndarray):
    """(X, 256) i32 dv plane: lanes [0,128) = doc keys, [128,256) =
    bitcast-f32 values, same row indexing as the source planes."""
    return jnp.concatenate([post_doc, post_val], axis=1)


def fused_search_dv(
    post_dv,
    row_start,
    indptr,
    rows,
    coeff,
    doc_base: int,
    n_blocks: int,
    block: int,
    k: int,
    n_docs: int,
    scale: float,
    clip: float,
    interpret: bool = False,
):
    """Convenience wrapper mirroring fused_pallas.fused_search: host
    plan + dv kernel + global-id masking (k <= 128 only — engine-level
    large-k requests fall back to the XLA twin before reaching here)."""
    import numpy as np

    from .fused_pallas import (
        _compact_rows,
        pick_stack,
        plan_tables,
    )

    assert k <= LANES
    srcrow, rem, abits, dstrow = plan_tables(
        row_start, indptr, rows, coeff, n_blocks, block
    )
    crows = _compact_rows(rem[:, 0, :], block)
    need = max(int(crows.sum(axis=1).max()), 1)
    r_c = 1 << int(np.ceil(np.log2(need)))
    nq = rows.shape[0]
    q_stack = pick_stack(nq, r_c) if nq & (nq - 1) == 0 else 1
    vals, docs = fused_search_dv_pallas(
        post_dv,
        jnp.asarray(srcrow),
        jnp.asarray(rem),
        jnp.asarray(abits),
        jnp.asarray(dstrow),
        n_blocks=n_blocks,
        block=block,
        s=rows.shape[1],
        k=k,
        n_docs=n_docs,
        scale=scale,
        clip=clip,
        r_c=r_c,
        q_stack=q_stack,
        interpret=interpret,
    )
    gids = jnp.where(vals > 0, docs + doc_base, -1)
    return vals, gids


def _fused_dv_kernel(
    srcrow_ref,  # (Q, 1, NB) SMEM
    rem_ref,  # (Q, 1, NB) SMEM
    abits_ref,  # (Q, 1, NB) SMEM
    dstrow_ref,  # (Q, 1, NB) SMEM — compacted destination rows
    dv_hbm,  # (X, 256) ANY — doc | val lanes
    vals_ref,  # (Q, 1, LANES) VMEM out
    docs_ref,  # (Q, 1, LANES) VMEM out
    dvbuf,  # (DEPTH, b128, 256) VMEM scratch
    dacc,  # (Q * R_C + b128, 128) VMEM scratch — compacted doc keys
    ciacc,  # (Q * R_C + b128, 128) VMEM scratch — contributions
    sems,  # (DEPTH,) DMA semaphores — ONE per in-flight block
    *,
    n_blocks: int,
    block: int,
    s: int,
    k: int,
    n_docs: int,
    scale: float,
    clip: float,
    r_c: int,
    q_stack: int,
):
    """Identical structure to fused_pallas._fused_kernel except the DMA
    phase: one (b128, 256) copy + one wait per block, halving both the
    transaction count and the semaphore waits the roofline flagged."""
    b128 = block // LANES
    from .fused_pallas import GRANULE_ROWS

    dacc[:] = jnp.full((q_stack * r_c + b128, LANES), n_docs, jnp.int32)
    ciacc[:] = jnp.zeros((q_stack * r_c + b128, LANES), jnp.int32)

    def get_dma(q, j, slot):
        src = srcrow_ref[q, 0, j]
        return pltpu.make_async_copy(
            dv_hbm.at[pl.ds(src, b128), :], dvbuf.at[slot], sems.at[slot]
        )

    def start(jj):
        q, j = divmod(jj, n_blocks)

        @pl.when(srcrow_ref[q, 0, j] >= 0)
        def _():
            get_dma(q, j, jj % DEPTH).start()

    total = q_stack * n_blocks
    for jj in range(min(DEPTH, total)):
        start(jj)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (b128, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (b128, LANES), 1)
    flat = r_idx * LANES + l_idx
    for jj in range(total):
        q, j = divmod(jj, n_blocks)
        slot = jj % DEPTH

        @pl.when(srcrow_ref[q, 0, j] >= 0)
        def _():
            get_dma(q, j, slot).wait()
            # tile-aligned lane halves: addressing only, no shuffles
            dch = dvbuf[slot, :, :LANES]
            vch = jax.lax.bitcast_convert_type(
                dvbuf[slot, :, LANES:], jnp.float32
            )
            a = jax.lax.bitcast_convert_type(
                jnp.full((b128, LANES), abits_ref[q, 0, j], jnp.int32),
                jnp.float32,
            )
            # DESIGN.md §2 quantization — identical ops to fused_pallas
            ci_f = jnp.round((a * vch) * scale)
            ci = jnp.clip(ci_f, 0.0, clip).astype(jnp.int32)
            valid = flat < rem_ref[q, 0, j]
            dst = q * r_c + dstrow_ref[q, 0, j]
            dacc[pl.ds(dst, b128), :] = jnp.where(valid, dch, n_docs)
            ciacc[pl.ds(dst, b128), :] = jnp.where(valid, ci, 0)

        nxt = jj + DEPTH
        if nxt < total:
            start(nxt)
    vals, docs = merge_rank_body(
        dacc[pl.ds(0, q_stack * r_c)],
        ciacc[pl.ds(0, q_stack * r_c)],
        block=GRANULE_ROWS * LANES,
        s=s,
        k=k,
        n_docs=n_docs,
        q_regions=q_stack,
    )
    vals_ref[:, 0, :] = vals
    docs_ref[:, 0, :] = docs


@partial(
    jax.jit,
    static_argnames=(
        "n_blocks",
        "block",
        "s",
        "k",
        "n_docs",
        "scale",
        "clip",
        "r_c",
        "q_stack",
        "interpret",
    ),
)
def fused_search_dv_pallas(
    post_dv: jnp.ndarray,  # (X, 256) i32 interleaved doc|val plane
    srcrow: jnp.ndarray,  # (nq, 1, NB) i32 from plan_tables
    rem: jnp.ndarray,  # (nq, 1, NB) i32
    abits: jnp.ndarray,  # (nq, 1, NB) i32
    dstrow: jnp.ndarray,  # (nq, 1, NB) i32 compacted destination rows
    n_blocks: int,
    block: int,
    s: int,
    k: int,
    n_docs: int,
    scale: float,
    clip: float,
    r_c: int | None = None,
    q_stack: int = 1,
    interpret: bool = False,
):
    """Drop-in twin of fused_pallas.fused_search_pallas over the dv
    plane: same plan tables, same outputs, bit for bit (tested)."""
    from ..index.csr import NNZ_SLICE_MARGIN
    from .fused_pallas import GRANULE_ROWS

    nq = srcrow.shape[0]
    b128 = block // LANES
    if r_c is None:
        r_c = n_blocks * b128
    assert k <= LANES
    assert r_c >= 1 and (r_c & (r_c - 1)) == 0, (
        f"r_c={r_c} must be a power of two (bitonic merge width)"
    )
    assert r_c % GRANULE_ROWS == 0
    assert q_stack >= 1 and nq % q_stack == 0, (
        f"q_stack={q_stack} must divide the batch ({nq})"
    )
    assert block <= NNZ_SLICE_MARGIN, (
        f"block={block} exceeds the builder's slice margin "
        f"({NNZ_SLICE_MARGIN}); tail DMAs would read out of bounds"
    )
    kernel = partial(
        _fused_dv_kernel,
        n_blocks=n_blocks,
        block=block,
        s=s,
        k=k,
        n_docs=n_docs,
        scale=scale,
        clip=clip,
        r_c=r_c,
        q_stack=q_stack,
    )
    smem = partial(
        pl.BlockSpec, (q_stack, 1, n_blocks), lambda q: (q, 0, 0),
        memory_space=pltpu.SMEM,
    )
    vals, docs = pl.pallas_call(
        kernel,
        grid=(nq // q_stack,),
        in_specs=[
            smem(),
            smem(),
            smem(),
            smem(),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (q_stack, 1, LANES), lambda q: (q, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (q_stack, 1, LANES), lambda q: (q, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, b128, 2 * LANES), jnp.int32),
            pltpu.VMEM((q_stack * r_c + b128, LANES), jnp.int32),
            pltpu.VMEM((q_stack * r_c + b128, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nq, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, 1, LANES), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(srcrow, rem, abits, dstrow, post_dv)
    return vals[:, 0, :k], docs[:, 0, :k]
