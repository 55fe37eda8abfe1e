"""Device-step A/B harness for kernel levers that need NO kernel-file
edit (editing ops/fused_pallas.py changes Mosaic debug info -> new
persistent-cache keys -> ~30 min of recompiles through the dev tunnel;
module-global monkeypatches + jax.clear_caches() only ADD new variants
while the baseline's stay cached).

Levers wired (pick with STEP_AB=comma list; each entry overrides
module/engine knobs relative to the CURRENT committed defaults, so the
"baseline" row is whatever ops/fused_pallas.py + ops/schedule.py ship):
  depth8 / depth16 / depth4 — fused_pallas.DEPTH (DMA pairs in flight;
             the roofline probe shows the DMA phase transaction-bound
             at ~128 ns/DMA, 8%% of HBM bandwidth)
  block4096 / block2048 — uniform block family (fewer DMA transactions
             at more bytes each; bandwidth headroom is ~12x)
  stack32  — MAX_STACK=32 + STACK_ROWS_BUDGET=4096 (more queries per
             program's region-parallel rank pipeline; re-test at every
             DMA-constant change — the r03 measurement was at
             DEPTH=4/block=2048)
  dv       — scorer="fused_dv" (ops/fused_dv.py: interleaved doc|val
             (X, 256) planes, ONE DMA per block — halves the
             transaction count the roofline flagged)
  mergeflip / mergerev — rank_pallas.MERGE_FLIP (flip-first mirror
             half-cleaner merge vs the reverse-odd-runs network; this
             one DOES require the committed kernel file to carry both
             paths — the flag only picks between them)
  ukeys / noukeys — fused_pallas.UNIQUE_KEYS (tie-free merge keep mask
             via (doc << kb) | slot candidate keys: -2 of the 12 ops
             per merge stage, +2 DMA-hidden ops on arrival + one
             post-merge shift)
  splitN   — engine.split_rows = N (e.g. split64): doc-range splitting
             of heavy queries into doc-disjoint pieces that rank in
             smaller regions and merge exactly (ops/schedule.py
             split_pieces; the roofline puts ~65% of rank ops in the
             heavy tail). split0 = off (the default)
  combos: join with '+', e.g. depth16+stack32.

Method: exactly bench.py's "device step only" protocol — capture the
staged _batch_step args from one real dispatch, then time `iters`
pipelined executions with full readback. Each variant re-captures (its
plan/kernels differ) after jax.clear_caches() so the monkeypatched
constant is re-traced. Results print ms/batch and q/s vs baseline.

Run AFTER bench.py (shares the chip): python tools/step_ab.py
Env: AB_DOCS (1M), AB_NQ (8192), AB_ITERS (24), AB_DEPTH (8 pipeline).
"""
from __future__ import annotations

import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_search_engine_tpu.utils.cache import enable_persistent_cache


def log(msg):
    print(msg, flush=True)


def capture_step_args(eng, pre, k):
    from document_search_engine_tpu.engine import engine as engine_mod

    captured = {}
    real_step = engine_mod._batch_step
    orig = real_step

    def capture(*args, **kw):
        captured["args"], captured["kw"] = args, kw
        return orig(*args, **kw)

    engine_mod._batch_step = capture
    try:
        fut = eng._dispatch(*pre, k)
        _ = eng._collect(fut)
    finally:
        engine_mod._batch_step = real_step
    return captured["args"], captured["kw"]


def time_step(args, kw, iters, depth, nq):
    from document_search_engine_tpu.engine import engine as engine_mod

    # warm (compile/load) outside the timed region
    _ = np.asarray(engine_mod._batch_step(*args, **kw))
    best = float("inf")
    for _p in range(2):
        t0 = time.perf_counter()
        inflight = deque()
        for _i in range(iters):
            inflight.append(engine_mod._batch_step(*args, **kw))
            if len(inflight) >= depth:
                _ = np.asarray(inflight.popleft())
        while inflight:
            _ = np.asarray(inflight.popleft())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best



def _fresh_plan_cache(eng):
    from document_search_engine_tpu.ops.plan_cache import PlanLayoutCache

    eng.plan_cache = PlanLayoutCache()


def main():
    enable_persistent_cache()
    import jax

    from document_search_engine_tpu.utils.cache import apply_env_platform

    apply_env_platform()

    from document_search_engine_tpu.config import IndexConfig, ScoringConfig
    from document_search_engine_tpu.ops import fused_pallas, rank_pallas

    import bench as B

    n_docs = int(os.environ.get("AB_DOCS", 1_000_000))
    vocab = int(os.environ.get("AB_VOCAB", 200_000))
    nq = int(os.environ.get("AB_NQ", 8192))
    tpq = int(os.environ.get("AB_TPQ", 8))
    iters = int(os.environ.get("AB_ITERS", 24))
    depth = int(os.environ.get("AB_DEPTH", 8))
    k = 10
    levers = os.environ.get("STEP_AB", "depth16,stack32").split(",")

    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    log(f"platform: {jax.devices()[0].platform} x{len(jax.devices())}")
    eng, df_by_row, tokens_by_row = B.build_synth_engine(
        n_docs, vocab, 60, cfg, seed=1
    )
    eng.scorer = "fused"

    rng = np.random.default_rng(7)
    eligible = np.where((df_by_row >= 64) & (df_by_row <= 32768))[0]
    rows = rng.choice(eligible, size=(nq, tpq))
    batch = [" ".join(tokens_by_row[r] for r in qr) for qr in rows]
    pre = eng.frontend.analyze(batch, eng.stats)

    results = []  # (name, ms) pairs — repeated levers (A-B-A) keep
    # every leg instead of dict-collapsing to the last one

    def run(name):
        args, kw = capture_step_args(eng, pre, k)
        ms = time_step(args, kw, iters, depth, nq) * 1e3
        results.append((name, ms))
        base = results[0][1] if results[0][0] == "baseline" else None
        rel = f" ({(base/ms-1)*+100:+.1f}% vs baseline)" if base else ""
        log(f"{name}: {ms:.2f} ms/batch -> {nq/ms*1e3:,.0f} q/s{rel}")

    # knob registry: name -> (apply, restore) closures over the module
    # globals / engine fields; defaults snapshot the committed values
    DEF = dict(
        merge_flip=getattr(rank_pallas, "MERGE_FLIP", True),
        depth=fused_pallas.DEPTH,
        max_stack=fused_pallas.MAX_STACK,
        budget=fused_pallas.STACK_ROWS_BUDGET,
        families=None,
        split_rows=eng.split_rows,  # engine default, NOT None
        unique_keys=fused_pallas.UNIQUE_KEYS,
    )

    def apply(name):
        for part in name.split("+"):
            if part.startswith("depth"):
                fused_pallas.DEPTH = int(part[5:])
            elif part.startswith("block"):
                eng.block_families = ((None, int(part[5:])),)
            elif part == "stack32":
                fused_pallas.MAX_STACK = 32
                fused_pallas.STACK_ROWS_BUDGET = 4096
            elif part == "dv":
                eng.scorer = "fused_dv"
            elif part == "mergeflip":
                rank_pallas.MERGE_FLIP = True
            elif part == "mergerev":
                rank_pallas.MERGE_FLIP = False
            elif part == "ukeys":
                fused_pallas.UNIQUE_KEYS = True
            elif part == "noukeys":
                fused_pallas.UNIQUE_KEYS = False
            elif part.startswith("split"):
                n = int(part[len("split"):])
                eng.split_rows = n if n > 0 else None
            else:
                raise SystemExit(f"unknown lever {part!r}")

    def restore():
        rank_pallas.MERGE_FLIP = DEF["merge_flip"]
        fused_pallas.UNIQUE_KEYS = DEF["unique_keys"]
        fused_pallas.DEPTH = DEF["depth"]
        fused_pallas.MAX_STACK = DEF["max_stack"]
        fused_pallas.STACK_ROWS_BUDGET = DEF["budget"]
        eng.block_families = DEF["families"]
        eng.scorer = "fused"
        eng.split_rows = DEF["split_rows"]

    t0 = time.perf_counter()
    run("baseline")
    log(f"[baseline total incl. warm {time.perf_counter()-t0:.0f}s]")

    for name in levers:
        apply(name)
        _fresh_plan_cache(eng)
        jax.clear_caches()
        t0 = time.perf_counter()
        run(name)
        log(f"[variant total incl. compile {time.perf_counter()-t0:.0f}s]")
        restore()
        _fresh_plan_cache(eng)
        jax.clear_caches()

    log(f"results: {[(kk, round(v, 2)) for kk, v in results]}")


if __name__ == "__main__":
    main()
