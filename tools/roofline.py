"""Roofline / MFU accounting for the production device step.

Reconstructs the EXACT bench workload (same Zipf df table, same query
sampler, same bucket planner as `bench.py` + `engine._plan_batch`) on
the host — no TPU needed — and accounts each pipeline stage of the
fused kernel (ops/fused_pallas.py) against TPU v5e hardware bounds:

  stage 1  DMA postings HBM->VMEM   — bytes moved vs HBM bandwidth AND
                                      transaction count vs DMA issue
                                      overhead (the real bound: blocks
                                      are 8 KB each)
  stage 2  quantize+compact stores  — elementwise VPU work on each
                                      (16,128) arrival
  stage 3  merge/run-sum/top-k      — compare-exchange network passes
                                      over the (q_stack*r_c, 128)
                                      stacked candidate buffer vs VPU
                                      issue throughput
  output   D2H readback             — bytes vs the dev tunnel's D2H

Hardware model (TPU v5 lite / v5e, single core — public figures):
  HBM bandwidth ~819 GB/s; VPU shape (8, 128) = 1024 lanes with ~4
  int32 ALUs per lane at ~0.9-1.5 GHz => ~3.7-6.1 T int32 op/s
  optimistic, ~0.9-1.5 T conservative (1 op/lane/cycle). Both bounds
  are printed; the truth for a roll/select-heavy network sits between.

Usage: python tools/roofline.py  (pure numpy; ~seconds)
Measured wall-clock phases to compare against come from the ROADMAP
probe (per 8192-query batch at production shapes, dev TPU):
  DMA+quantize+assembly ~18 ms, stacked rank pipeline ~30-40 ms,
  readback ~15 ms, device step total 81.4-82.1 ms.
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
HBM_GBPS = 819e9
# VPU int32 issue bounds (ops/sec): lanes * ALUs * clock
VPU_HI = 1024 * 4 * 1.5e9  # every lane 4-issue at 1.5 GHz
VPU_LO = 1024 * 1 * 0.9e9  # every lane 1-issue at 0.9 GHz


def merge_stage_count(c_region: int, run: int) -> int:
    """Compare-exchange stages in the bitonic merge of `c_region`-sized
    regions built from pre-sorted `run`-element runs (rank_pallas
    stage 1): reversal passes + sum over levels of log2(level)."""
    if c_region // run < 2:
        return 0
    stages = 0
    level = 2 * run
    while level <= c_region:
        stages += int(math.log2(level))
        level *= 2
    return stages


def rank_pipeline_passes(
    c_region: int, run: int, s: int, k: int, merge_flip: bool | None = None,
    unique_keys: bool | None = None,
) -> dict:
    """Full-array vector-op passes (each touching every element of the
    stacked (q_stack*r_c, 128) buffer once) per pipeline stage, with
    per-stage op weights from the kernel source (ops/rank_pallas.py):

    Classic scheme (MERGE_FLIP=False):
    - odd-run reversal: log2(run) xor_perm passes x 2 arrays, each
      xor_perm = 2 rolls + 1 select = 3 ops (masks precomputed/shared).
    - merge stage: 2 xor_perms (d, ci) + keep mask (eq, lt, eq-dir, or)
      + 2 selects ~= 12 ops.

    Flip scheme (MERGE_FLIP=True): no reversal; per level ONE mirror
    half-cleaner (2 lax.rev group flips + le/ge/select keep + 2 selects
    ~= 7 ops) replaces the stride-L/2 xor pass, and the remaining
    strides are direction-free (~11 ops).

    Shared:
    - run-sum pass (ceil(log2(s))): 2 shift_rights (~4 ops each) +
      eq + select + add ~= 11 ops.
    - top-k extraction (k<=16): per result ~2 tree reductions
      (log2(r_c*128) steps but counted as ~2 full passes each on the
      region) + 3 selects ~= 7 full passes per k.
    """
    if merge_flip is None:
        from document_search_engine_tpu.ops.rank_pallas import MERGE_FLIP

        merge_flip = MERGE_FLIP
    if unique_keys is None:
        from document_search_engine_tpu.ops.fused_pallas import UNIQUE_KEYS

        unique_keys = UNIQUE_KEYS
    # unique candidate keys (fused_pallas.UNIQUE_KEYS): the tie-
    # consistency eq+or drop from every merge keep mask (-2 ops/stage),
    # paid back by one post-merge shift to recover doc ids (the 2-op
    # keying on arrival rides the DMA phase, hidden)
    stage_ops = 10 if unique_keys else 12
    unkey = 1 if unique_keys else 0
    if merge_flip:
        rev = 0
        merge = 0
        if c_region // run >= 2:
            level = 2 * run
            while level <= c_region:
                merge += 7 - (2 if unique_keys else 0)
                merge += (int(math.log2(level)) - 1) * (
                    11 - (2 if unique_keys else 0)
                )
                level *= 2
    else:
        rev = int(math.log2(run)) * 2 * 3
        merge = merge_stage_count(c_region, run) * stage_ops
    runsum = max(1, math.ceil(math.log2(max(s, 2)))) * 11
    topk = k * 7
    return {
        "reversal": rev, "merge": merge, "unkey": unkey,
        "runsum": runsum, "topk": topk,
    }


def main():
    import bench as B
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.index import builder
    from document_search_engine_tpu.ops.fused_pallas import (
        GRANULE_ROWS,
        pick_stack,
    )
    from document_search_engine_tpu.ops.schedule import (
        FUSED_FAMILIES,
        plan_batch,
    )

    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    vocab = int(os.environ.get("BENCH_VOCAB", 200_000))
    avg_terms = int(os.environ.get("BENCH_AVG_TERMS", 60))
    nq = int(os.environ.get("BENCH_NQ", 8192))
    tpq = int(os.environ.get("BENCH_TERMS_PER_QUERY", 8))
    k = 10
    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))

    # same df table as bench.build_synth_engine (hash-order permutation
    # does not change the length distribution, so skip the hashing)
    df_by_row = B.zipf_df(n_docs, vocab, avg_terms)
    lens_all = df_by_row.astype(np.int64)
    indptr = np.zeros(vocab + 1, np.int64)
    np.cumsum(lens_all, out=indptr[1:])
    indptr = indptr.astype(np.int32)

    # same query sampler as bench (seed 7, eligible df in [64, 32768])
    rng = np.random.default_rng(7)
    eligible = np.where((df_by_row >= 64) & (df_by_row <= 32768))[0]
    rows = rng.choice(eligible, size=(nq, tpq))
    found = np.ones((nq, tpq), bool)

    # same bucket planner as the engine's fused path
    plans = plan_batch(
        indptr, rows, found,
        families=FUSED_FAMILIES, min_blocks=4, compact=True,
    )

    print(f"workload: nq={nq} tpq={tpq} vocab={vocab} docs={n_docs}")
    lens = (indptr[rows + 1] - indptr[rows]).astype(np.int64)
    print(
        f"postings/query: mean {lens.sum(1).mean():,.0f}  "
        f"p50 {np.median(lens.sum(1)):,.0f}  max {lens.sum(1).max():,}"
    )

    tot_bytes = 0.0
    tot_dmas = 0
    tot_rank_ops = 0.0
    tot_quant_ops = 0.0
    tot_programs = 0
    hdr = (
        f"{'bucket':>8} {'bq':>6} {'nb':>4} {'r_c':>5} {'qstk':>4} "
        f"{'progs':>6} {'DMA MB':>8} {'DMAs':>8} {'rank Gop':>9}"
    )
    print(hdr)
    for idx, n_blocks, block, r_c in plans:
        bq_nat = len(idx)
        bq = 1 << int(np.ceil(np.log2(max(bq_nat, 1))))  # engine pads pow2
        q_stack = pick_stack(bq, r_c)
        b128 = block // LANES
        # actual DMAs: blocks with srcrow >= 0 (= ceil(len/block) per
        # found slot), x2 planes, each (b128, 128) i32 = b128*512 bytes
        blk = (-(-lens[idx] // block)).sum()
        dmas = int(blk) * 2
        bytes_ = float(dmas) * b128 * LANES * 4
        # quantize+store on each arrival: ~8 elementwise ops per block
        # element (bitcast, mul, mul, round, clip, cast, 2 selects + 2
        # stores) over (b128, 128)
        quant = float(blk) * b128 * LANES * 10
        progs = bq // q_stack
        c_region = r_c * LANES
        passes = rank_pipeline_passes(
            c_region, GRANULE_ROWS * LANES, tpq, k
        )
        ops_per_elem = sum(passes.values())
        rank = float(progs) * (q_stack * r_c * LANES) * ops_per_elem
        tot_bytes += bytes_
        tot_dmas += dmas
        tot_rank_ops += rank
        tot_quant_ops += quant
        tot_programs += progs
        print(
            f"{bq_nat:>8} {bq:>6} {n_blocks:>4} {r_c:>5} {q_stack:>4} "
            f"{progs:>6} {bytes_/1e6:>8.1f} {dmas:>8} {rank/1e9:>9.2f}"
        )

    print()
    print(f"totals per {nq}-query batch ({tot_programs} programs):")
    t_bw = tot_bytes / HBM_GBPS
    print(
        f"  DMA: {tot_bytes/1e6:.0f} MB in {tot_dmas:,} transactions "
        f"({tot_bytes/max(tot_dmas,1)/1024:.0f} KB each)\n"
        f"       bandwidth bound {t_bw*1e3:.2f} ms @ {HBM_GBPS/1e9:.0f} "
        f"GB/s; measured DMA+quantize+assembly ~18 ms\n"
        f"       => {t_bw*1e3/18*100:.0f}% of HBM roofline: the phase is "
        f"TRANSACTION-bound (~{18e-3/max(tot_dmas,1)*1e9:.0f} ns/DMA "
        f"issue+wait), not bandwidth-bound"
    )
    q_hi = tot_quant_ops / VPU_HI * 1e3
    q_lo = tot_quant_ops / VPU_LO * 1e3
    print(
        f"  quantize+compact stores: {tot_quant_ops/1e9:.1f} G int32 "
        f"ops => {q_hi:.1f}-{q_lo:.1f} ms at VPU bounds"
    )
    r_hi = tot_rank_ops / VPU_HI * 1e3
    r_lo = tot_rank_ops / VPU_LO * 1e3
    print(
        f"  rank pipeline: {tot_rank_ops/1e9:.1f} G int32 ops "
        f"(merge/run-sum/top-k passes) => {r_hi:.1f}-{r_lo:.1f} ms at "
        f"VPU bounds; measured ~30-40 ms\n"
        f"       => measured sits at "
        f"{r_hi/35*100:.0f}%-{r_lo/35*100:.0f}% of the VPU-issue "
        f"roofline for the op count the network executes"
    )
    d2h = nq * 2 * k * 4
    print(
        f"  D2H: {d2h/1e3:.0f} KB ranked results "
        f"(plus per-bucket pow-2 bq padding); measured readback ~15 ms "
        f"is tunnel latency, not volume"
    )
    print(
        f"  device step measured: 81.4-82.1 ms/batch "
        f"(~{nq/0.0817:,.0f} q/s)"
    )


if __name__ == "__main__":
    main()
