#!/usr/bin/env bash
# Round-5 hardware measurement session. Exclusive chip use; compare only
# within-session (tunnel alloc varies ~2x on bandwidth-bound work).
# Results land in /tmp/hw_r5/. Queue (VERDICT r4 items in parens):
#   1. Mosaic-in-shard_map smoke: the kernel-enabled dp path lowers + runs
#      on the real chip (#1)
#   2. v4 pipelined talker kernel A/B vs auto (v1/v2): single-stream
#      C=512, long-form 1024/2048 frames (#4; targets talker <=1.0 ms,
#      long-form >=500 gen f/s)
#   3. continuous 512-request steady state, overlap_harvest on vs off
#      (#3; target >=1.2x arrival-static)
#   4. Poisson arrival latency at ~0.5 and ~0.8 utilization (#2)
#   5. streaming under load: group emission (default now) + admission
#      pacing 16, lanes 64; then lanes 128 at C=512 (#6; targets p50
#      <500 ms, p99 <8 s at >=500 aggregate f/s)
#   6. B=128 serving e2e with the r4 vocode fixes (#5; target e2e >= 3288)
#   7. bench.py headline (vs_prior + vs_best gates)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_r5; mkdir -p "$OUT"

if ! timeout 240 python -c "import jax; print(jax.devices())"; then
  echo "TPU tunnel down (device init did not answer in 240s) — aborting" >&2
  exit 2
fi

step() {
  name=$1; shift
  echo "=== $name ==="
  timeout 3300 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  rc=$?
  tail -2 "$OUT/$name.out"
  echo "rc=$rc (full logs: $OUT/$name.{out,err})"
}

# 1. kernel-safety on silicon
step shard_map_kernel python tools/smoke_shard_map_kernel.py

# 2. v4 talker kernel A/B (separate processes — env gates are trace-time)
step talker_v4_single   env QWEN3TTS_TALKER_KERNEL=pipelined python tools/smoke_fused_talker_hbm.py
step talker_auto_single env QWEN3TTS_TALKER_KERNEL=auto      python tools/smoke_fused_talker_hbm.py
step longform_v4   env QWEN3TTS_TALKER_KERNEL=pipelined python tools/benchmark_serving.py --skip-batch --long 2048
step longform_auto env QWEN3TTS_TALKER_KERNEL=auto      python tools/benchmark_serving.py --skip-batch --long 2048

# 3. continuous steady state: overlap A/B
step cont_512_overlap env QWEN3TTS_OVERLAP_HARVEST=1 python tools/benchmark_continuous.py --lanes 64 --requests 512 --arrival-static --no-sorted
step cont_512_serial  env QWEN3TTS_OVERLAP_HARVEST=0 python tools/benchmark_continuous.py --lanes 64 --requests 512 --arrival-static --no-sorted

# 4. Poisson arrivals (rate derived from the cont_512 continuous fps; the
#    defaults assume ~2500 f/s — override --capacity-fps after reading #3)
step arrivals_u50 python tools/benchmark_arrivals.py --lanes 64 --requests 192 --utilization 0.5
step arrivals_u80 python tools/benchmark_arrivals.py --lanes 64 --requests 192 --utilization 0.8

# 5. streaming under load
step stream_64        python tools/benchmark_streaming_load.py --lanes 64 --requests 128
step stream_64_pace16 python tools/benchmark_streaming_load.py --lanes 64 --requests 128 --admit-per-chunk 16
step stream_128       python tools/benchmark_streaming_load.py --lanes 128 --requests 128

# 6. B=128 serving e2e
step serving_b128_e2e python tools/benchmark_serving.py --batch 128 --skip-long

# 7. headline
step bench_headline python bench.py
echo "=== r5 session done; write verdicts into docs/performance.md"
