"""Batch-size (BENCH_NQ) A/B on the PUBLIC serving loop, interleaved.

Why: the bench default nq=8192 rests on a round-3-era sweep ("16384
adds 2x latency for <1% more") measured when the device step was
~107 ms/8192. The round-4/5 kernel levers cut the step to ~67.7 ms, of
which ~15 ms is the per-dispatch D2H readback and ~35 ms the tunnel's
serialized dispatch floor (ROADMAP env facts) — fixed per-batch costs
that a bigger batch amortizes. Re-measure before trusting the old
number.

Method: ONE process builds the 1M-doc bench index once, preplans and
warms every nq leg, then runs the legs' timed passes INTERLEAVED
(A-B-A-B...) with a tunnel probe before each pass, so both legs sample
the same tunnel-health windows. Total queries per pass are equal
(iters scales as base_iters * base_nq / nq). Step-only timings per leg
print at the end.

Usage: python tools/nq_ab.py
Env: AB_NQS ("8192,16384"), AB_DOCS (1M), AB_PASSES (5), AB_ITERS (24,
     at the FIRST nq; scaled for the others), AB_DEPTH (8), AB_K (10).
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


def main():
    enable_persistent_cache()
    import jax

    from document_search_engine_tpu.utils.cache import apply_env_platform

    apply_env_platform()

    import bench as B
    from document_search_engine_tpu.config import IndexConfig, ScoringConfig

    nqs = [int(x) for x in os.environ.get("AB_NQS", "8192,16384").split(",")]
    n_docs = int(os.environ.get("AB_DOCS", 1_000_000))
    vocab = max(50_000, n_docs // 5)
    passes = int(os.environ.get("AB_PASSES", 5))
    base_iters = int(os.environ.get("AB_ITERS", 24))
    depth = int(os.environ.get("AB_DEPTH", 8))
    k = int(os.environ.get("AB_K", 10))
    tpq = 8

    cfg = IndexConfig(scoring=ScoringConfig(kind="bm25"))
    log(f"platform: {jax.devices()[0].platform} x{len(jax.devices())}")
    on_tpu = jax.devices()[0].platform == "tpu"
    eng, df_by_row, tokens_by_row = B.build_synth_engine(
        n_docs, vocab, 60, cfg, seed=1
    )

    from document_search_engine_tpu.ops.plan_cache import PlanLayoutCache

    # one PlanLayoutCache PER LEG: the layout key excludes nq
    # (engine._plan_key), so a shared cache seeded by the big leg would
    # make the small leg run zero-padded big-leg cells — 2x the work —
    # and the A/B would be vacuous. Swapping the cache object per leg
    # reuses each leg's already-compiled programs (the jit cache keys on
    # shapes/statics, not on the cache object).
    legs = []  # (nq, iters, batches, plan_cache)
    for nq in nqs:
        iters = max(base_iters * nqs[0] // nq, 4)
        batches, avg_post = B.make_batches(
            df_by_row, tokens_by_row, nq, tpq, 4, seed=7
        )
        legs.append((nq, iters, batches, PlanLayoutCache()))
        log(f"leg nq={nq}: iters/pass={iters}, 4 fresh text batches, "
            f"avg postings/query {avg_post}")

    # preplan + warm every leg before ANY timed pass, so compiles and
    # executable uploads (minutes on the tunnel) never sit inside or
    # right before a timed window of one leg only
    for nq, _iters, batches, pc in legs:
        eng.plan_cache = pc
        t0 = time.perf_counter()
        eng.preplan(batches, k=k)
        for _o in eng.search_stream(iter(batches), k=k, depth=depth):
            pass
        log(f"warm nq={nq}: {time.perf_counter()-t0:.1f}s; "
            f"{eng.plan_cache.stats()}")

    cooldown = int(os.environ.get("AB_COOLDOWN", "60" if on_tpu else "0"))
    if cooldown:
        log(f"cooldown {cooldown}s")
        time.sleep(cooldown)

    results = {nq: [] for nq in nqs}
    probes = {nq: [] for nq in nqs}
    for p in range(passes):
        for nq, iters, batches, pc in legs:
            eng.plan_cache = pc
            probe = B.tunnel_probe(on_tpu)
            t0 = time.perf_counter()
            n_out = 0
            for ids, _sc in eng.search_stream(
                iter([batches[i % len(batches)] for i in range(iters)]),
                k=k, depth=depth,
            ):
                n_out += len(ids)
            dt = time.perf_counter() - t0
            assert n_out == nq * iters
            qps = nq * iters / dt
            results[nq].append(qps)
            probes[nq].append(probe)
            pr = (f"probe {probe[0]:.0f}/{probe[1]:.0f} ms; "
                  if probe else "")
            log(f"pass {p+1}/{passes} nq={nq}: {qps:,.0f} q/s "
                f"({dt/iters*1e3:.2f} ms/batch; {pr}{iters} iters)")
        if on_tpu and p < passes - 1:
            time.sleep(8)

    log("— engine serving summary —")
    for nq in nqs:
        r = np.array(results[nq])
        log(f"nq={nq}: best {r.max():,.0f} / median "
            f"{np.median(r):,.0f} q/s over {len(r)} passes "
            f"({[round(x) for x in r]})")

    # step-only per leg (bench.py protocol: captured staged batch)
    from document_search_engine_tpu.engine import engine as engine_mod

    for nq, iters, batches, pc in legs:
        eng.plan_cache = pc
        pre = eng.frontend.analyze(batches[0], eng.stats)
        captured = {}
        real_step = engine_mod._batch_step

        def capture(*args, **kw):
            captured["args"], captured["kw"] = args, kw
            return real_step(*args, **kw)

        engine_mod._batch_step = capture
        try:
            _ = eng._collect(eng._dispatch(*pre, k))
        finally:
            engine_mod._batch_step = real_step
        args, kw = captured["args"], captured["kw"]
        _ = np.asarray(real_step(*args, **kw))  # warm
        best = float("inf")
        for _p in range(2):
            t0 = time.perf_counter()
            inflight = deque()
            for _i in range(iters):
                inflight.append(real_step(*args, **kw))
                if len(inflight) >= depth:
                    _ = np.asarray(inflight.popleft())
            while inflight:
                _ = np.asarray(inflight.popleft())
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"step-only nq={nq}: {best*1e3:.2f} ms/batch -> "
            f"{nq/best:,.0f} q/s")


if __name__ == "__main__":
    main()
