"""Pallas TPU kernel: fused per-shard rank stage (merge + run-sums + top-k).

This is the "Pallas per-shard partial top-k" of the north star
(BASELINE.json:5) and the production replacement for the XLA tail of the
packed scorer (ops/packed.py rank_candidates): a full `lax.sort` plus S-1
shifted-window passes plus `lax.top_k`, each of which streams the whole
(nq, C) candidate buffer through HBM. Here the buffer is read into VMEM
once per query and everything runs on the VPU:

1. merge   — the packed buffer arrives as `n_blocks` aligned runs of
             `block` postings, each already doc-ascending (CSR rows are
             doc-sorted; sentinel-padded tails sort last). A merge
             network sorts the whole row in O(C * log(C) * log(C/block))
             compare-exchanges instead of a full O(C log^2 C) sort.
             `lax.sort` has no Pallas TPU lowering, so the network is
             hand-rolled: every stride is a lane/sublane `pltpu.roll`
             pair + select (partner index = f XOR stride). Two schemes
             (MERGE_FLIP): the classic reverse-odd-runs bitonic network
             (default) or flip-first mirror half-cleaners (rejected on
             hardware grounds — see the MERGE_FLIP comment); identical
             outputs, A/B-able via tools/step_ab.py.
2. run-sum — per-doc score = integer sum of its (<= s, one per slot)
             adjacent contributions: Hillis-Steele segmented scan,
             ceil(log2(s)) shifted passes (sorted rows make segment
             membership a single d-equality test at each distance).
3. top-k   — k iterations of (max score, then min doc id among maxima)
             full-array reductions: exactly `lax.top_k`'s tie order
             (doc-ascending rows => tie-stability by index == by doc id).

All arithmetic is the same order-free int32 fixed-point as the XLA path
(DESIGN.md §2), so results are bit-identical to rank_candidates — gated by
tests/test_rank_pallas.py in interpret mode and tests/test_tpu_smoke.py on
hardware.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Merge-network scheme for stage 1 (merge_rank_body). True = flip-first
# mirror half-cleaners: every level L merges two ASCENDING L/2-runs with
# one group flip + an elementwise keep (min to the low half in order,
# max to the high half mirrored — a reversed bitonic sequence is still
# bitonic), then direction-free ascending half-cleaners at strides
# L/4..1. The scheme's ~20%-fewer-ops accounting assumed the group flip
# is ONE op (lax.rev); hardware verdict (round 4): **Mosaic TPU does
# not lower `rev` at all** (NotImplementedError at compile), so
# flip_groups decomposes the reversal into log2(L) xor_perm roll+select
# passes — which ADDS roughly one full half-cleaner sweep per level and
# makes the flip scheme strictly more passes than the classic
# reverse-odd-runs network (False). REJECTED on those grounds; kept
# compilable (small-shape hardware parity gate in tests/test_tpu_smoke)
# as documentation and in case a future Mosaic grows a rev/reverse
# primitive, which would flip the economics back. Both schemes produce
# identical output (fuzz-pinned; the whole rank path is order-free
# int32 after the sort). Module-level so tools/step_ab.py can A/B
# without edits.
MERGE_FLIP = False


def _roll(x, sh: int, axis: int):
    """pltpu.roll with any-sign static shift (roll right by sh)."""
    n = x.shape[axis]
    sh = sh % n
    if sh == 0:
        return x
    return pltpu.roll(x, sh, axis=axis)


def _extract_topk(cand, d, *, k: int, n_docs: int):
    """Iterative top-k extraction over one query's (R, 128) candidates:
    ~5 full-array passes per result — the cheapest exact scheme at small
    k (the production k=10). Returns (vals, docs) as (1, LANES)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    vals_out = jnp.full((1, LANES), -1, jnp.int32)
    docs_out = jnp.full((1, LANES), -1, jnp.int32)
    for t in range(k):
        m = jnp.max(cand)
        sel = jnp.min(jnp.where(cand == m, d, jnp.int32(n_docs)))
        hit = m > 0
        vals_out = jnp.where((lane == t) & hit, m, vals_out)
        docs_out = jnp.where((lane == t) & hit, sel, docs_out)
        cand = jnp.where((cand == m) & (d == sel), jnp.int32(-1), cand)
    return vals_out, docs_out


def merge_rank_body(
    d, ci, *, block: int, s: int, k: int, n_docs: int, q_regions: int = 1,
    key_bits: int = 0
):
    """The shared in-VMEM rank pipeline on (R, 128) values: bitonic merge
    of the pre-sorted `block`-runs, segmented run-sums, iterative top-k.
    Used by the standalone rank kernel below and the fused
    DMA-pack+score+rank kernel (ops/fused_pallas.py).

    q_regions == 1 (the standalone-kernel case): one query's candidates;
    returns (vals, docs) as (1, LANES) lane vectors (first k lanes used).

    q_regions > 1 (the stacked fused kernel): the rows hold q_regions
    independent queries as contiguous pow-2 regions of R/q_regions rows
    each. Every xor-stride network op stays inside its region
    automatically (XOR of a sub-region stride preserves the region
    bits), so ONE full-array pass advances every query's network by one
    stage — the per-stage dependency latency that dominates small
    per-query buffers (measured: 4x fewer rows bought only 1.4x) is
    amortized q_regions ways. Returns (vals, docs) as
    (q_regions, LANES) — row q is query q's lane vector.

    key_bits > 0 (fused_pallas UNIQUE_KEYS): `d` holds keys
    (doc << key_bits) | slot, unique among REAL candidates, with a
    constant sentinel fill (n_docs << key_bits). The merge's keep mask
    drops its tie-consistency term — the eq exists only because a tied
    compare-exchange duplicates one ci payload over the other, which
    matters iff tied keys can carry DIFFERENT payloads; real keys
    never tie and sentinel payloads are all 0, so duplication is a
    no-op. One shift recovers true doc ids for the run-sum/top-k
    stages (sentinels shift to exactly n_docs, which every downstream
    gate already treats as padding)."""
    r_dim = d.shape[0]
    assert r_dim % q_regions == 0
    region_rows = r_dim // q_regions
    c_region = region_rows * LANES  # per-query candidate capacity
    assert c_region & (c_region - 1) == 0
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (r_dim, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (r_dim, LANES), 1)
    f = r_idx * LANES + l_idx
    # flat position within the query's own region: identical to f for
    # one region (bit masking below region size is a no-op there)
    f_loc = f & (c_region - 1) if q_regions > 1 else f

    # bit masks are shared across passes (d and ci use the same stride,
    # and `is_low` below IS the stride's select mask); computing each
    # once keeps ~40% of the per-pass vector ops out of the network
    _masks: dict = {}

    def bit_clear(kk):
        """(f & kk) == 0 for a power-of-two kk, computed once."""
        if kk not in _masks:
            if kk < LANES:
                _masks[kk] = (l_idx & kk) == 0
            else:
                _masks[kk] = (r_idx & (kk // LANES)) == 0
        return _masks[kk]

    def xor_perm(x, kk):
        """y[f] = x[f XOR kk], kk a power of two < c_region. Region-safe
        by construction: f XOR kk shares f's region bits."""
        if kk < LANES:
            up = _roll(x, -kk, 1)  # x[r, l+kk] at lanes with bit kk clear
            dn = _roll(x, kk, 1)
        else:
            rr = kk // LANES
            up = _roll(x, -rr, 0)
            dn = _roll(x, rr, 0)
        return jnp.where(bit_clear(kk), up, dn)

    def shift_right(x, j, fill):
        """y[f] = x[f-j] (0 < j < 128), `fill` for f_loc < j (shifts
        never cross a region boundary)."""
        same = _roll(x, j, 1)  # x[r, l-j] where l >= j
        prev = _roll(_roll(x, 1, 0), j, 1)  # x[r-1, 128-j+l] where l < j
        y = jnp.where(l_idx >= j, same, prev)
        return jnp.where(f_loc >= j, y, fill)

    def flip_groups(x, g_rows: int):
        """Reverse elements within each g_rows*LANES flat group. For a
        pow-2 group size L, reversal is y[f] = x[f XOR (L-1)] (L-1 is
        all-ones, so (L-1)-f == f XOR (L-1)), composed from one xor_perm
        per bit. lax.rev would be ONE op but Mosaic TPU does not lower
        `rev` (hardware-verified NotImplementedError), so the flip costs
        log2(L) roll+select passes — which is why MERGE_FLIP loses to
        the classic network on hardware (see MERGE_FLIP docstring) and
        stays default-off."""
        size = g_rows * LANES
        kk = 1
        while kk < size:
            x = xor_perm(x, kk)
            kk *= 2
        return x

    # --- stage 1: merge of the pre-sorted ascending `block`-runs -------
    n_runs = c_region // block
    if n_runs >= 2 and MERGE_FLIP:
        # flip-first scheme (MERGE_FLIP docstring): at each level the
        # window holds two ascending L/2-runs; the mirror half-cleaner
        # pairs position f with its window mirror via ONE group flip,
        # min lands in the low half in order, max in the high half
        # mirrored (reversed-bitonic == bitonic), then plain ascending
        # half-cleaners finish both halves — no run reversal, no
        # direction masks. Group flips nest inside regions (level <=
        # c_region and both are pow-2 aligned), so stacking is safe.
        level = 2 * block
        while level <= c_region:
            fd = flip_groups(d, level // LANES)
            fci = flip_groups(ci, level // LANES)
            is_low = bit_clear(level // 2)
            # boolean-identical to where(is_low, d <= fd, d >= fd);
            # Mosaic cannot lower a select BETWEEN two i1 vectors
            # (arith.trunci i8->i1, hardware-verified compile error).
            # Unique keys (key_bits > 0): ties are sentinel-only with
            # equal zero payloads — drop the eq term.
            if key_bits:
                keep = (d < fd) == is_low
            else:
                keep = (d == fd) | ((d < fd) == is_low)
            d = jnp.where(keep, d, fd)
            ci = jnp.where(keep, ci, fci)
            kk = level // 4
            while kk >= 1:
                pd = xor_perm(d, kk)
                pci = xor_perm(ci, kk)
                if key_bits:
                    keep = (d < pd) == bit_clear(kk)
                else:
                    keep = (d == pd) | ((d < pd) == bit_clear(kk))
                d = jnp.where(keep, d, pd)
                ci = jnp.where(keep, ci, pci)
                kk //= 2
            level *= 2
    elif n_runs >= 2:
        # classic bitonic network — the DEFAULT (hardware-winning)
        # scheme; the flip branch above is the kept-compilable A/B
        # alternative (rejected on hardware: see MERGE_FLIP comment).
        # Reverse odd runs (XOR with block-1, one bit at a time) so runs
        # alternate ascending/descending — each pair is then bitonic
        odd_run = ~bit_clear(block)
        kk = 1
        while kk < block:
            d = jnp.where(odd_run, xor_perm(d, kk), d)
            ci = jnp.where(odd_run, xor_perm(ci, kk), ci)
            kk *= 2
        # merge levels: bitonic length L -> sorted runs of L, directions
        # alternating by bit L of f (all-ascending at the final level,
        # which spans exactly one region)
        level = 2 * block
        while level <= c_region:
            if level < c_region:
                desc = ~bit_clear(level)
            else:
                desc = None
            kk = level // 2
            while kk >= 1:
                pd = xor_perm(d, kk)
                pci = xor_perm(ci, kk)
                is_low = bit_clear(kk)
                eff = is_low if desc is None else jnp.logical_xor(
                    is_low, desc
                )
                if key_bits:
                    # unique keys: the eq term of the hardware-
                    # validated keep exists only to stop a tied
                    # exchange duplicating one payload over the other;
                    # real keys never tie and sentinel ties carry
                    # equal zero payloads, so 2 ops replace 4 in EVERY
                    # merge stage (the roofline's dominant op count)
                    keep = (d < pd) == eff
                else:
                    # hardware-validated tie-safe form (121k step
                    # recorded on it)
                    keep = (d == pd) | ((d < pd) == eff)
                d = jnp.where(keep, d, pd)
                ci = jnp.where(keep, ci, pci)
                kk //= 2
            level *= 2

    # recover true doc ids from unique keys: one full-array shift. Tied
    # (equal-doc) groups are adjacent either way — keys sort doc-major —
    # and sentinel fills shift to >= n_docs, so every downstream stage
    # sees exactly what the tie-safe path produces (bit-identical).
    if key_bits:
        d = d >> key_bits

    # --- stage 2: segmented run-sums (a doc spans <= s positions) ------
    run = ci
    j = 1
    while j < s:
        dj = shift_right(d, j, jnp.int32(-1))
        rj = shift_right(run, j, jnp.int32(0))
        run = run + jnp.where(dj == d, rj, 0)
        j *= 2

    # --- stage 3: candidates at run ends, then iterative top-k ---------
    nxt_same = _roll(d, -1, 1)
    nxt_prev = _roll(_roll(d, -1, 0), -1, 1)
    d_next = jnp.where(l_idx < LANES - 1, nxt_same, nxt_prev)
    d_next = jnp.where(f_loc < c_region - 1, d_next, jnp.int32(-2))
    cand = jnp.where(
        (d != d_next) & (d < n_docs) & (run > 0), run, jnp.int32(-1)
    )
    if k <= 16:
        if q_regions == 1:
            return _extract_topk(cand, d, k=k, n_docs=n_docs)
        # per-region extraction: each region's chain of serial
        # reductions is independent of the others, so the unrolled
        # per-region slices interleave in the VLIW schedule instead of
        # stalling on one query's reduction latency
        outs = [
            _extract_topk(
                cand[q * region_rows : (q + 1) * region_rows],
                d[q * region_rows : (q + 1) * region_rows],
                k=k,
                n_docs=n_docs,
            )
            for q in range(q_regions)
        ]
        return (
            jnp.concatenate([v for v, _ in outs], axis=0),
            jnp.concatenate([g for _, g in outs], axis=0),
        )

    # --- large-k (17..128): bitonic tournament top-128 ------------------
    # Each sublane row is bitonic-sorted by (cand desc, d asc) — rows
    # alternate descending/ascending — then log2(R) tournament rounds
    # keep the top 128 of each row pair (elementwise winner of a
    # desc-sorted row vs an asc-sorted partner is the top-128 set, as a
    # bitonic sequence) and re-sort with one 7-pass bitonic merge. Fixed
    # ~84 lane passes for ANY k <= 128, vs ~5k extraction passes
    # (measured: k=64 extraction dropped serving 50k -> 21k qps).
    def better(c_a, d_a, c_b, d_b):
        """a ranks strictly before b under (cand desc, doc asc)."""
        return (c_a > c_b) | ((c_a == c_b) & (d_a < d_b))

    def ce_lane(c, dd, kk, first_low):
        """Two-key compare-exchange at lane stride kk: where first_low,
        the lower index keeps the better-ranked element (and vice
        versa). Full ties keep both sides in place (consistent)."""
        pc = xor_perm(c, kk)
        pd_ = xor_perm(dd, kk)
        tie = (c == pc) & (dd == pd_)
        first_pos = jnp.logical_xor(bit_clear(kk), ~first_low)
        keep = tie | (better(c, dd, pc, pd_) == first_pos)
        return jnp.where(keep, c, pc), jnp.where(keep, dd, pd_)

    # stage A: bitonic sort of each row's 128 lanes; row r sorts desc
    # when (r & 1) == 0, asc otherwise
    row_desc = {}

    def row_bit(rr):
        if rr not in row_desc:
            row_desc[rr] = (r_idx & rr) == 0
        return row_desc[rr]

    for p in (1, 2, 4, 8, 16, 32, 64):
        # direction of each 2p lane group (final level: one group/row)
        if 2 * p < LANES:
            grp_desc = bit_clear(2 * p)
        else:
            grp_desc = jnp.ones((r_dim, LANES), bool)
        if region_rows > 1:
            dir_desc = jnp.logical_xor(grp_desc, ~row_bit(1))
        else:
            # single-row regions never enter the tournament loop, so
            # there is no final normalizing round — every row must sort
            # descending here (alternating by row parity would leave
            # odd regions ascending and extraction would read the worst
            # candidates)
            dir_desc = grp_desc
        kk = p
        while kk >= 1:
            cand, d = ce_lane(cand, d, kk, dir_desc)
            kk //= 2

    # tournament rounds: winner rows live at multiples of 2s. Strides
    # stay below region_rows, so each region runs its own tournament.
    s_stride = 1
    while s_stride < region_rows:
        pc = xor_perm(cand, s_stride * LANES)
        pd_ = xor_perm(d, s_stride * LANES)
        win = better(cand, d, pc, pd_)
        cand = jnp.where(win, cand, pc)
        d = jnp.where(win, d, pd_)
        # re-sort each (bitonic) row; direction for the next round:
        # desc when (r & 2s) == 0 (all-desc at the final round)
        if 2 * s_stride < region_rows:
            nxt_desc = row_bit(2 * s_stride)
        else:
            nxt_desc = jnp.ones((r_dim, LANES), bool)
        kk = 64
        while kk >= 1:
            cand, d = ce_lane(cand, d, kk, nxt_desc)
            kk //= 2
        s_stride *= 2

    # each region's start row now holds its top-128, (cand desc, d asc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    vs, gs = [], []
    for q in range(q_regions):
        c0 = cand[q * region_rows : q * region_rows + 1, :]
        d0 = d[q * region_rows : q * region_rows + 1, :]
        good = (lane < k) & (c0 > 0)
        vs.append(jnp.where(good, c0, jnp.int32(-1)))
        gs.append(jnp.where(good, d0, jnp.int32(-1)))
    if q_regions == 1:
        return vs[0], gs[0]
    return jnp.concatenate(vs, axis=0), jnp.concatenate(gs, axis=0)


def _rank_kernel(d_ref, ci_ref, vals_ref, docs_ref, *, block: int, s: int,
                 k: int, n_docs: int):
    vals_out, docs_out = merge_rank_body(
        d_ref[0], ci_ref[0], block=block, s=s, k=k, n_docs=n_docs
    )
    vals_ref[0] = vals_out
    docs_ref[0] = docs_out


@partial(
    jax.jit, static_argnames=("block", "s", "k", "n_docs", "interpret")
)
def rank_pallas(
    d3: jnp.ndarray,  # (nq, R, 128) int32 doc keys (sentinel n_docs pads)
    ci3: jnp.ndarray,  # (nq, R, 128) int32 quantized contributions
    block: int,  # every aligned `block`-run of the flat row is ascending
    s: int,  # max occurrences of one doc per row (= active query slots)
    k: int,
    n_docs: int,
    interpret: bool = False,
):
    """(vals, docs_local) (nq, k) int32, ranked (score desc, doc asc);
    exhausted slots are (-1, -1). Flat row-major view of (R, 128) is the
    candidate row (f = r*128 + l).

    Precondition (as for rank_candidates): a doc id appears at most `s`
    times per row — guaranteed in production because CSR rows hold unique
    docs (builder aggregates tf per (term, doc)) and a query has `s`
    slots. Rows violating it diverge from rank_candidates (whose shifted
    windows cap at s) rather than erroring."""
    nq, r_dim, lanes = d3.shape
    assert lanes == LANES
    c_total = r_dim * LANES
    assert c_total % block == 0 and (c_total & (c_total - 1)) == 0
    assert (block & (block - 1)) == 0 and block >= LANES
    assert k <= LANES, "kernel stores top-k in one lane vector"
    # the segmented run-sum shifts by powers of two < s; shift_right is
    # only correct for distances < 128
    assert s <= LANES, f"s={s} exceeds the kernel's run-sum shift range"
    kernel = partial(
        _rank_kernel, block=block, s=s, k=k, n_docs=n_docs
    )
    vals, docs = pl.pallas_call(
        kernel,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec(
                (1, r_dim, LANES),
                lambda q: (q, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 2,
        out_specs=(
            pl.BlockSpec(
                (1, 1, LANES), lambda q: (q, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, LANES), lambda q: (q, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, 1, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(d3, ci3)
    return vals[:, 0, :k], docs[:, 0, :k]


def rank_candidates_pallas(
    d_key: jnp.ndarray,  # (nq, C) int32
    ci: jnp.ndarray,  # (nq, C) int32
    doc_base,
    block: int,
    s: int,
    k: int,
    n_docs: int,
    interpret: bool = False,
):
    """Drop-in replacement for ops.packed.rank_candidates when the rows
    are `block`-run sorted (the search_packed_ds layout): same outputs,
    bit for bit (tested)."""
    nq, c_total = d_key.shape
    kk = min(k, c_total)
    vals, docs = rank_pallas(
        d_key.reshape(nq, c_total // LANES, LANES),
        ci.reshape(nq, c_total // LANES, LANES),
        block=block,
        s=s,
        k=kk,
        n_docs=n_docs,
        interpret=interpret,
    )
    gids = jnp.where(vals > 0, docs + doc_base, -1)
    if kk < k:
        vals = jnp.concatenate(
            [vals, jnp.full((nq, k - kk), -1, vals.dtype)], axis=1
        )
        gids = jnp.concatenate(
            [gids, jnp.full((nq, k - kk), -1, gids.dtype)], axis=1
        )
    return vals, gids
