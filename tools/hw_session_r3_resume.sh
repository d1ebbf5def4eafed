#!/usr/bin/env bash
# Remaining round-3 hardware steps (hw_session_r3.sh died after profile_b64
# when its parent session was killed). Same discipline: exclusive chip use,
# compare only within-session. Results append to /tmp/hw_r3/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_r3; mkdir -p "$OUT"

if ! timeout 240 python -c "import jax; print(jax.devices())"; then
  echo "TPU tunnel down (device init did not answer in 240s) — aborting" >&2
  exit 2
fi

step() {
  name=$1; shift
  echo "=== $name ==="
  timeout 2700 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  rc=$?
  tail -2 "$OUT/$name.out"
  echo "rc=$rc (full logs: $OUT/$name.{out,err})"
}

step serving_b64_q4         env QWEN3TTS_BENCH_QUANT=q4 python tools/benchmark_serving.py --batch 64
step bench_bf16             env QWEN3TTS_BENCH_QUANT=bf16 python bench.py
step bench_q4               env QWEN3TTS_BENCH_QUANT=q4 python bench.py
step bench_q4pure           env QWEN3TTS_BENCH_QUANT=q4pure python bench.py
step serving_b128_int8kv    env QWEN3TTS_KV_INT8=1 python tools/benchmark_serving.py --batch 128 --skip-long
step serving_b128_bf16kv    python tools/benchmark_serving.py --batch 128 --skip-long
step continuous_b64         python tools/benchmark_continuous.py --lanes 64 --requests 192 --capacity 1024
echo "=== resume done"
