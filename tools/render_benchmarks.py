#!/usr/bin/env python
"""Render the README benchmark section + a round-over-round history chart.

TPU analog of the reference's benchmark snapshot renderer
(scripts/benchmark_pytorch_vs_cpp.py:142-217, which writes a comparison
chart and a README table after every benchmark run): one reproducible tool
so the published numbers can never drift from the measured artifacts.

Inputs (all already in the tree):
  BENCH_r*.json               driver-recorded headline runs, one per round
  docs/benchmark_snapshot.json  curated cross-scenario snapshot (single-
                              stream tiers, batched serving, long-form,
                              speaker encoder, reference baselines)

Outputs:
  README.md                   the block between <!-- BENCH:BEGIN --> and
                              <!-- BENCH:END --> is regenerated
  docs/benchmark_history.png  headline frames/s + TTFA per round vs the
                              reference baseline (requires matplotlib;
                              skipped with a note if unavailable)

    python tools/render_benchmarks.py [--check]

--check: exit 1 if README is out of date (CI-style drift guard) without
writing anything. Pure host tool — never touches the TPU.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def load_rounds() -> list[dict]:
    rounds = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        try:
            d = json.load(open(path))
        except (OSError, ValueError):
            continue
        p = d.get("parsed") or {}
        if d.get("rc") == 0 and p.get("value"):
            rounds.append(dict(
                n=d.get("n"), rtf=p["value"],
                fps=p.get("frames_per_s"), ttfa=p.get("ttfa_p50_ms"),
                quant=p.get("quant", "int8"), file=os.path.basename(path)))
    return rounds


def fmt(x, nd=1):
    if x is None:
        return "—"
    s = f"{x:,.{nd}f}"
    return s.rstrip("0").rstrip(".") if "." in s else s


def render_block(snap: dict, rounds: list[dict]) -> str:
    ss8 = snap["single_stream_int8"]
    q4 = snap["single_stream_q4"]
    b16 = snap["single_stream_bf16"]
    srv = snap["batched_serving_int8"]
    lf = snap["long_form_streaming"]
    ref = snap["reference_baselines"]
    vs = snap["vs_baseline"]
    date = snap.get("date", "")
    dev = snap.get("device", "")

    srv_cells = []
    for key in sorted(srv, key=lambda k: (len(k), k)):
        if not key.startswith("batch_"):
            continue
        b = key.split("_")[1]
        srv_cells.append(f"B={b}: {srv[key]['aggregate_frames_per_s']:,}")
    b64_rtf = srv.get("batch_64", {}).get("aggregate_rtf")
    b128_rtf = srv.get("batch_128", {}).get("aggregate_rtf")
    peak_rtf = b128_rtf or b64_rtf

    lines = [
        BEGIN,
        f"_Snapshot {date}, {dev}; regenerate with "
        "`python tools/render_benchmarks.py` after a `bench.py` run._",
        "",
        "| metric | int8 (Q8_0-parity, default) | q4 (Q4_K tier) | bf16 |",
        "|---|---|---|---|",
        "| audio RTF (one-dispatch e2e) | "
        f"**{fmt(ss8['audio_rtf_single_dispatch_e2e'])}x** real-time | "
        f"{fmt(q4['audio_rtf'])}x | {fmt(b16['audio_rtf'])}x |",
        "| generation | "
        f"**{fmt(ss8['frames_per_s'])} frames/s** ({ss8['gen_ms_per_frame']} ms/f) | "
        f"{fmt(q4['frames_per_s'])} f/s ({q4['gen_ms_per_frame']} ms/f) | "
        f"{fmt(b16['frames_per_s'])} f/s |",
        f"| time-to-first-audio p50 | **{fmt(ss8['ttfa_p50_ms'])} ms** "
        f"({ss8.get('ttfa_chunk_frames', 8)}-frame streaming chunk; "
        "~27 ms of it is fixed remote-tunnel dispatch) | | |",
        f"| vocoder | ~{fmt(ss8['vocoder_x_realtime'], 0)}x real-time "
        "(matmul-form convolutions) | | |",
        "",
        f"Batched serving (aggregate frames/s): {' / '.join(srv_cells)}"
        + (f" — aggregate audio RTF ~{fmt(peak_rtf, 0)}x." if peak_rtf else "."),
        f"Long-form streaming: {lf['frames']} frames "
        f"({fmt(lf['audio_seconds'], 0)} s audio) at "
        f"{fmt(lf['gen_frames_per_s'])} frames/s generation, "
        f"end-to-end RTF {fmt(lf['end_to_end_rtf'])}.",
        f"Speaker encoding (voice clone): "
        f"{fmt(snap['speaker_encoder']['ms_for_30s_reference_audio'])} ms "
        "for 30 s of reference audio.",
        "",
        f"Reference baselines: {ref['frames_per_s']} frames/s / RTF "
        f"{ref['audio_rtf']} on {ref['hardware'].split(' (')[0]} — this build "
        f"is ~{fmt(vs['audio_rtf_ratio'], 0)}x the baseline audio RTF and "
        f"~{fmt(vs['frames_per_s_ratio'], 0)}x the frame rate; north star "
        f"({ref['north_star']}) exceeded in every precision.",
    ]
    if rounds:
        lines += [
            "",
            "Round history (driver-recorded `BENCH_r*.json`, int8 headline):",
            "",
            "| round | audio RTF | frames/s | TTFA p50 ms |",
            "|---|---|---|---|",
        ]
        for r in rounds:
            lines.append(f"| r{r['n']} | {fmt(r['rtf'])} | {fmt(r['fps'])} "
                         f"| {fmt(r['ttfa'])} |")
    lines.append(END)
    return "\n".join(lines)


def render_chart(rounds: list[dict], snap: dict, path: str) -> bool:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001
        return False
    if not rounds:
        return False
    xs = [r["n"] for r in rounds]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.4), dpi=120)
    ax1.plot(xs, [r["fps"] for r in rounds], "o-", color="#2a6fdb",
             label="this build (int8)")
    ref_fps = snap["reference_baselines"]["frames_per_s"]
    ax1.axhline(ref_fps, color="#999999", ls="--", lw=1,
                label=f"reference ({ref_fps} f/s)")
    ax1.axhline(125, color="#cc7722", ls=":", lw=1, label="north star (125)")
    ax1.set_yscale("log")
    ax1.set_xlabel("build round")
    ax1.set_ylabel("generation frames/s (log)")
    ax1.set_xticks(xs)
    ax1.legend(fontsize=7, loc="center right")
    ax1.set_title("throughput vs reference", fontsize=9)
    ax2.plot(xs, [r["ttfa"] for r in rounds], "s-", color="#2aa876")
    ax2.set_xlabel("build round")
    ax2.set_ylabel("TTFA p50 (ms)")
    ax2.set_xticks(xs)
    ax2.set_ylim(bottom=0)
    ax2.set_title("time-to-first-audio", fontsize=9)
    fig.suptitle("qwen3tts_tpu benchmark history (one TPU v5e chip)",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README is stale; write nothing")
    args = ap.parse_args()

    snap = json.load(open(os.path.join(ROOT, "docs", "benchmark_snapshot.json")))
    rounds = load_rounds()
    block = render_block(snap, rounds)

    readme_path = os.path.join(ROOT, "README.md")
    text = open(readme_path).read()
    if BEGIN not in text or END not in text:
        print(f"README.md lacks the {BEGIN} … {END} markers", file=sys.stderr)
        return 1
    new = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block, text,
                 flags=re.S)
    if args.check:
        if new != text:
            print("README benchmark section is STALE — run "
                  "tools/render_benchmarks.py", file=sys.stderr)
            return 1
        print("README benchmark section up to date")
        return 0
    if new != text:
        open(readme_path, "w").write(new)
        print("README.md benchmark section regenerated")
    else:
        print("README.md already up to date")
    chart = os.path.join(ROOT, "docs", "benchmark_history.png")
    if render_chart(rounds, snap, chart):
        print(f"chart written: {os.path.relpath(chart, ROOT)}")
    else:
        print("matplotlib unavailable or no rounds — chart skipped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
