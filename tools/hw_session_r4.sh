#!/usr/bin/env bash
# Round-4 hardware measurement session. Exclusive chip use; compare only
# within-session (tunnel alloc varies ~2x on bandwidth-bound work).
# Results append to /tmp/hw_r4/. Queue (VERDICT r3 items in parens):
#   1. continuous-vs-static A/B re-measure after the host-PRNGKey fix —
#      192 reqs (parity with the r4 first measurements) + 512 reqs
#      (steady-state: the 192-req run is tail-drain-dominated at B=64,
#      so its 0.624 occupancy is a small-workload artifact) (#2)
#   2. per-frame cost table, single + batched (#5)
#   3. streaming continuous serving TTFA under load (#4)
#   4. batched glue decomposition to completion (#3)
#   5. bench.py headline (BENCH_r04 dry run incl. vs_best gate)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_r4; mkdir -p "$OUT"

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

step cont_ab_192      python tools/benchmark_continuous.py --lanes 64 --requests 192 --arrival-static --timing
step cont_ab_512      python tools/benchmark_continuous.py --lanes 64 --requests 512 --arrival-static --no-sorted --timing
step per_frame_single python tools/per_frame_table.py --mode single --json /tmp/hw_r4/per_frame_single.json
step per_frame_batched python tools/per_frame_table.py --mode batched --json /tmp/hw_r4/per_frame_batched.json
step streaming_load   python tools/benchmark_streaming_load.py --lanes 64 --requests 128
step serving_b64_e2e  python tools/benchmark_serving.py --batch 64 --skip-long
step profile_b64      python tools/profile_batched.py --batch 64 --frames 128
step bench_headline   python bench.py
echo "=== r4 session done; write verdicts into docs/performance.md"
