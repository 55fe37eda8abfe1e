"""Pallas TPU kernel: fused search step over an interleaved doc|val
plane — ONE DMA per block instead of two.

The round-4 roofline (tools/roofline.py, ROADMAP table) measured the
fused kernel's DMA phase TRANSACTION-bound: ~134 ns per DMA at only
8-15% of HBM bandwidth, with two DMAs (doc plane + val plane) issued
and waited per (query, block). This variant stores postings as one
(X, 256) int32 plane — lanes [0, 128) hold the doc keys, lanes
[128, 256) the bitcast-f32 values, row for row — so each block costs a
single contiguous DMA and a single semaphore wait. The VMEM split
back into doc/val halves is a tile-aligned lane slice (lane tiles are
128 wide): pure addressing, no shuffles, no extra passes. Plan
tables, compaction, stacking and the whole rank pipeline are
IDENTICAL to ops/fused_pallas.py (same srcrow row offsets — the dv
plane has the same row indexing, just 256 lanes per row).

Alignment: a 256-lane int32 HBM memref is two (8, 128) column tiles,
so Mosaic requires dynamic dim-0 DMA offsets to be multiples of 8
(measured on hardware — the (X, 128) planes escape this because one
column tile keeps any row range flat-contiguous). srcrow offsets are
arbitrary rows, so each DMA starts at the enclosing 8-row boundary
(`pl.multiple_of` carries the proof) and copies an 8-row overhang;
the true offset is taken as a dynamic sublane slice in VMEM. That is
+8/b128 extra bytes (+25% at the production block=4096) on a phase
the roofline measured TRANSACTION-bound at 8-15% of HBM bandwidth —
bytes are free, transactions are not.

The dv plane is derived ON DEVICE from the resident doc/val planes
(`interleave_planes`, one jit concat + 8-row overhang pad) so index
layout, checkpoints and every other consumer of (X, 128) planes are
untouched.

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

from .fused_pallas import DEPTH, DST_MASK
from .rank_pallas import LANES, merge_rank_body


ALIGN_ROWS = 8  # HBM dim-0 tile rows: dv DMAs start at multiples of this


@jax.jit
def interleave_planes(post_doc: jnp.ndarray, post_val: jnp.ndarray):
    """(X + 8, 256) i32 dv plane: lanes [0,128) = doc keys, [128,256) =
    bitcast-f32 values, same row indexing as the source planes. The 8
    extra zero rows cover the aligned-DMA overhang past the planes'
    NNZ_SLICE_MARGIN tail (content never selected — rem masks it)."""
    dv = jnp.concatenate([post_doc, post_val], axis=1)
    return jnp.pad(dv, ((0, ALIGN_ROWS), (0, 0)))


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
    phase: one (b128 + 8, 256) copy + one wait per block, halving both
    the transaction count and the semaphore waits the roofline flagged.
    The copy starts at the enclosing ALIGN_ROWS boundary (Mosaic proof
    via pl.multiple_of). The 256-lane landed buffer is NEVER indexed at
    a dynamic offset (two lane tiles would demand the same 8-row proof
    in VMEM): all b128+8 rows are scored, the validity mask shifts by
    the misalignment, and the store into the 128-lane accumulators is a
    read-modify-write over a window whose out-of-block rows keep the
    old contents — so the up-to-8-row overhang can never clobber a
    neighboring block's or query-region's data. The accumulators carry
    ALIGN_ROWS leading pad rows so the window base stays non-negative."""
    b128 = block // LANES
    from .fused_pallas import GRANULE_ROWS

    acc_rows = ALIGN_ROWS + q_stack * r_c + b128 + ALIGN_ROWS
    dacc[:] = jnp.full((acc_rows, LANES), n_docs, jnp.int32)
    ciacc[:] = jnp.zeros((acc_rows, LANES), jnp.int32)

    def get_dma(q, j, slot):
        src = srcrow_ref[q, 0, j]
        src_al = pl.multiple_of(
            (src // ALIGN_ROWS) * ALIGN_ROWS, ALIGN_ROWS
        )
        return pltpu.make_async_copy(
            dv_hbm.at[pl.ds(src_al, b128 + ALIGN_ROWS), :],
            dvbuf.at[slot],
            sems.at[slot],
        )

    def start(jj):
        q, j = divmod(jj, n_blocks)

        @pl.when(srcrow_ref[q, 0, j] >= 0)
        def _():
            get_dma(q, j, jj % DEPTH).start()

    total = q_stack * n_blocks
    for jj in range(min(DEPTH, total)):
        start(jj)
    rows40 = b128 + ALIGN_ROWS
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows40, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (rows40, LANES), 1)
    flat40 = r_idx * LANES + l_idx
    for jj in range(total):
        q, j = divmod(jj, n_blocks)
        slot = jj % DEPTH

        @pl.when(srcrow_ref[q, 0, j] >= 0)
        def _():
            get_dma(q, j, slot).wait()
            src = srcrow_ref[q, 0, j]
            off = src % ALIGN_ROWS
            landed = dvbuf[slot]  # (rows40, 256), static read only
            # tile-aligned lane halves: addressing only, no shuffles
            dch = landed[:, :LANES]
            vch = jax.lax.bitcast_convert_type(
                landed[:, LANES:], jnp.float32
            )
            a = jax.lax.bitcast_convert_type(
                jnp.full((rows40, LANES), abits_ref[q, 0, j], jnp.int32),
                jnp.float32,
            )
            # DESIGN.md §2 quantization — identical ops to fused_pallas
            ci_f = jnp.round((a * vch) * scale)
            ci = jnp.clip(ci_f, 0.0, clip).astype(jnp.int32)
            # landed row r holds source row src - off + r: the block's
            # element i is flat40 = off*128 + i, so shift the masks
            rel = flat40 - off * LANES
            valid = (rel >= 0) & (rel < rem_ref[q, 0, j])
            inblock = (rel >= 0) & (rel < block)
            # dstrow carries the slot id in its high bits (fused_pallas
            # UNIQUE_KEYS packing); this kernel ranks raw doc ids (the
            # tie-safe merge), so only the row offset is used
            dst = q * r_c + (dstrow_ref[q, 0, j] & DST_MASK)
            base = dst + ALIGN_ROWS - off  # landed row 0's dacc row
            old_d = dacc[pl.ds(base, rows40), :]
            old_ci = ciacc[pl.ds(base, rows40), :]
            dacc[pl.ds(base, rows40), :] = jnp.where(
                valid, dch, jnp.where(inblock, n_docs, old_d)
            )
            ciacc[pl.ds(base, rows40), :] = jnp.where(
                valid, ci, jnp.where(inblock, 0, old_ci)
            )

        nxt = jj + DEPTH
        if nxt < total:
            start(nxt)
    vals, docs = merge_rank_body(
        dacc[pl.ds(ALIGN_ROWS, q_stack * r_c)],
        ciacc[pl.ds(ALIGN_ROWS, q_stack * r_c)],
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
            pltpu.VMEM((DEPTH, b128 + ALIGN_ROWS, 2 * LANES), jnp.int32),
            pltpu.VMEM(
                (2 * ALIGN_ROWS + q_stack * r_c + b128, LANES), jnp.int32
            ),
            pltpu.VMEM(
                (2 * ALIGN_ROWS + q_stack * r_c + b128, LANES), jnp.int32
            ),
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
