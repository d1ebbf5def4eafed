#!/usr/bin/env bash
# Round-2 hardware measurement sequence (run when the TPU tunnel is live).
# Each step runs EXCLUSIVELY (CLAUDE.md: concurrent users of the tunneled
# chip corrupt wall-clock timings). Results land in /tmp/hw_r2/.
#
# Measures, in priority order:
#   1. bench.py int8      — headline + kernel smokes (incl. new cb0 variants)
#   2. bench.py int8, QWEN3TTS_KERNEL_CB0=0 — A/B the in-kernel cb0 epilogue
#   3. serving B=64 int8 (cb0 on/off)       — batched glue A/B
#   4. serving B=64 q4                      — batched w4 weight stream
#   5. bench.py bf16                        — fused bf16 tier (vs r1's 159 f/s)
#   6. bench.py q4                          — single-stream q4 check
# Abort any step that exceeds ~45 min wall (compile service variance).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_r2; mkdir -p "$OUT"

# A dead tunnel HANGS backend init (CLAUDE.md); refuse to start blind.
if ! timeout 240 python -c "import jax; print(jax.devices())"; then
  echo "TPU tunnel down (device init did not answer in 240s) — aborting" >&2
  exit 2
fi

step() {
  name=$1; shift
  echo "=== $name ==="
  /usr/bin/time -v timeout 2700 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  rc=$?
  tail -2 "$OUT/$name.out"
  echo "rc=$rc (full logs: $OUT/$name.{out,err})"
}

step bench_int8            python bench.py
step bench_int8_nocb0      env QWEN3TTS_KERNEL_CB0=0 python bench.py
step serving_b64_int8      python tools/benchmark_serving.py --batch 64
step serving_b64_int8_nocb0 env QWEN3TTS_KERNEL_CB0=0 python tools/benchmark_serving.py --batch 64
step serving_b64_q4        env QWEN3TTS_BENCH_QUANT=q4 python tools/benchmark_serving.py --batch 64
step bench_bf16            env QWEN3TTS_BENCH_QUANT=bf16 python bench.py
step bench_q4              env QWEN3TTS_BENCH_QUANT=q4 python bench.py
step serving_b128_int8kv   env QWEN3TTS_KV_INT8=1 python tools/benchmark_serving.py --batch 128 --skip-long
step serving_b128_bf16kv   python tools/benchmark_serving.py --batch 128 --skip-long
echo "=== done; compare within THIS session only (tunnel alloc varies 2x) ==="
