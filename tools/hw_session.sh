#!/usr/bin/env bash
# Queued hardware session (run when the axon tunnel returns; see
# ROADMAP "pending the tunnel"). Order matters:
#   1. bench.py   — warms the NEW fused/rank kernel cache keys (the
#                   round-4 rank_pallas.py edits changed them) AND
#                   records the driver-style numbers.
#   2. step_ab    — the two built rank levers (MERGE_FLIP, doc-range
#                   splitting) and their composition, vs the committed
#                   baseline on the same index/batch.
#   3. TPU gates  — DSE_TPU_TESTS=1 smoke suite.
# Logs land in /tmp/hw_YYYYmmdd_HHMM/. Adoption decisions (flip
# defaults, README/ROADMAP numbers) are manual, from the logs.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%Y%m%d_%H%M)
OUT=/tmp/hw_$TS
mkdir -p "$OUT"
echo "logs: $OUT"

python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1', 8083))" \
  || { echo "tunnel DOWN — aborting"; exit 1; }

echo "== 1/3 bench.py (full driver-style; warms new kernel cache keys)"
timeout 5400 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.log"
echo "bench exit=$? json:"; cat "$OUT/bench.json" || true
tail -20 "$OUT/bench.log"

echo "== 2/3 step A/Bs (rank levers)"
STEP_AB=mergeflip,split64,split32,mergeflip+split64 \
  timeout 5400 python tools/step_ab.py >"$OUT/step_ab.log" 2>&1
echo "step_ab exit=$?"; tail -12 "$OUT/step_ab.log"

echo "== 3/3 TPU hardware gates"
DSE_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_smoke.py -q \
  >"$OUT/tpu_gates.log" 2>&1
echo "gates exit=$?"; tail -5 "$OUT/tpu_gates.log"

echo "done — review $OUT, adopt winners, refresh README/ROADMAP"
