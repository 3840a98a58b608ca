#!/bin/bash
# One-shot on-chip measurement batch for round 3 (run when the axon tunnel
# is up). Each step is independently time-boxed; logs land in /tmp/r3/.
set -u
mkdir -p /tmp/r3
cd "$(dirname "$0")/.."

echo "== 1/5 headline bench (turbo + gen tiers)"
timeout 3000 python bench.py > /tmp/r3/bench.json 2> /tmp/r3/bench.err
tail -1 /tmp/r3/bench.json || true

echo "== 2/5 int8 tower A/B + trace (s2d stem check)"
timeout 1800 python scripts/bench_int8_tower.py > /tmp/r3/int8_tower.log 2>&1
tail -5 /tmp/r3/int8_tower.log || true

echo "== 3/5 int8 text tower A/B"
timeout 1800 python scripts/bench_int8_text.py > /tmp/r3/int8_text.log 2>&1
tail -5 /tmp/r3/int8_text.log || true

echo "== 4/5 clean beam/greedy measure (UNCONTENDED — nothing else running)"
timeout 1800 python scripts/bench_beam.py > /tmp/r3/beam.log 2>&1
tail -5 /tmp/r3/beam.log || true

echo "== 5/5 concurrent serving load (32 clients, beam gen)"
timeout 1800 python scripts/bench_serving.py --clients 32 --seconds 30 \
  --mode turbo > /tmp/r3/serving.log 2>&1
tail -10 /tmp/r3/serving.log || true
echo "== 5b: 8-client pass (isolates 1-CPU-host thread-scheduling overhead)"
timeout 1200 python scripts/bench_serving.py --clients 8 --seconds 30 \
  --mode turbo > /tmp/r3/serving_c8.log 2>&1
tail -3 /tmp/r3/serving_c8.log || true

echo "== 6/7 train-step throughput (joint fusion phase, bf16, B sweep)"
timeout 1800 python scripts/bench_train.py > /tmp/r3/train.log 2>&1
tail -5 /tmp/r3/train.log || true
timeout 1800 python scripts/bench_train.py 64 > /tmp/r3/train_b64.log 2>&1
tail -2 /tmp/r3/train_b64.log || true
timeout 1800 python scripts/bench_train.py 128 > /tmp/r3/train_b128.log 2>&1
tail -2 /tmp/r3/train_b128.log || true

echo "== 7/7 beam device trace (only if beam4 < 230/s — decision table)"
beam=$(awk '/\[bench_beam\] beam4:/ {print int($3); exit}' /tmp/r3/beam.log)
if [ "${beam:-0}" -lt 230 ]; then
  timeout 1800 python scripts/trace_beam.py > /tmp/r3/beam_trace.log 2>&1
  tail -12 /tmp/r3/beam_trace.log || true
fi

echo "done; logs in /tmp/r3/"
