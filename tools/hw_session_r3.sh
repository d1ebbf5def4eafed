#!/usr/bin/env bash
# Round-3 hardware measurement sequence (run when the TPU tunnel is live).
# Supersedes hw_session_r2.sh — banks every round-2 AND round-3 landing.
# Each step runs EXCLUSIVELY (CLAUDE.md: concurrent users of the tunneled
# chip corrupt wall-clock timings). Results land in /tmp/hw_r3/.
#
# Priority order (VERDICT r2 "Next round"):
#   1. bench.py int8          — headline + kernel smokes + 8-frame TTFA
#                               (VERDICT #1, #2); emits vs_prior verdict (#7)
#   2. KERNEL_CB0=0 A/B       — keep/revert the in-kernel cb0 epilogue (#8)
#   3. serving B=64 int8 (cb0 on/off) — batched glue A/B
#   4. profile_batched        — glue decomposition BEFORE building more (#5)
#   5. serving B=64 q4        — batched MIXED-tier weight stream (#3)
#   6. bench bf16 / q4 / q4pure — tier single-stream numbers
#   7. B=128 int8-KV + bf16-KV — serving sweet spot (#4)
#
# Abort any step that exceeds ~45 min wall (compile service variance).
# Compare ONLY within this session (tunnel alloc varies 2x on batched).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_r3; mkdir -p "$OUT"

# A dead tunnel HANGS backend init (CLAUDE.md); refuse to start blind.
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

step bench_int8             python bench.py
step bench_int8_nocb0       env QWEN3TTS_KERNEL_CB0=0 python bench.py
step serving_b64_int8       python tools/benchmark_serving.py --batch 64
step serving_b64_int8_nocb0 env QWEN3TTS_KERNEL_CB0=0 python tools/benchmark_serving.py --batch 64
step profile_b64            python tools/profile_batched.py --batch 64 --frames 128
step serving_b64_q4         env QWEN3TTS_BENCH_QUANT=q4 python tools/benchmark_serving.py --batch 64
step bench_bf16             env QWEN3TTS_BENCH_QUANT=bf16 python bench.py
step bench_q4               env QWEN3TTS_BENCH_QUANT=q4 python bench.py
step bench_q4pure           env QWEN3TTS_BENCH_QUANT=q4pure python bench.py
step serving_b128_int8kv    env QWEN3TTS_KV_INT8=1 python tools/benchmark_serving.py --batch 128 --skip-long
step serving_b128_bf16kv    python tools/benchmark_serving.py --batch 128 --skip-long
# continuous batching vs the static loop on a variable-length mix (r3):
# useful-frames/s both sides; expect ~1.3-1.6x from refilled lanes
step continuous_b64         python tools/benchmark_continuous.py --lanes 64 --requests 192 --capacity 1024
echo "=== done; flip QWEN3TTS_* defaults from these measurements (VERDICT #8)"
echo "=== and record keep/revert verdicts in docs/performance.md"
