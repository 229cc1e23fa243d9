"""Summarize an xplane trace directory as a per-op table (the roofline
evidence format used in BASELINE.md).

    python benchmarks/optable.py /tmp/xp_c3_fwd [top_n]

Reads the xplane.pb files a `--profile-dir` run (or jax.profiler
start/stop_trace) wrote, converts via xprof's op_profile tool, and prints
the top ops by raw time with their FLOPs- and bandwidth-utilization —
what "bound by" judgments are made from.
"""

from __future__ import annotations

import glob
import json
import sys


def main(trace_dir: str, top_n: int = 12) -> None:
    from xprof.convert import raw_to_tool_data as r2t

    xs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xs:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = r2t.xspace_to_tool_data(xs, "op_profile", {})
    d = json.loads(data)
    kids = (d.get("byCategory") or d.get("byProgram"))["children"]
    # an input-bound trace can have IDLE as the top "program" — report the
    # biggest real program, and say how much idle surrounded it
    root = next((c for c in kids
                 if "IDLE" not in c["name"].upper()), kids[0])
    idle = sum(c["metrics"]["rawTime"] for c in kids
               if "IDLE" in c["name"].upper())
    if idle:
        tot_all = sum(c["metrics"]["rawTime"] for c in kids)
        print(f"note: {idle / tot_all * 100:.1f}% of the trace window is "
              "IDLE (input/host-bound) — the table below covers the "
              "on-device program only")
    tot = root["metrics"]["rawTime"]
    print(f"program: {root['name']}  total rawTime {tot:.3e}  "
          f"flops_util {root['metrics'].get('flops', 0):.3f}")
    cats = root["children"]
    for c in sorted(cats, key=lambda c: -c["metrics"]["rawTime"])[:top_n]:
        m = c["metrics"]
        bw = m.get("bandwidthUtils", [0])
        print(f"{m['rawTime'] / tot * 100:6.2f}%  "
              f"flops_util={m.get('flops', 0):.3f}  bw_util={bw[0]:.3f}  "
              f"{c['name'][:70]}  (n={m.get('occurrences')})")
        for g in sorted(c.get("children", []),
                        key=lambda g: -g["metrics"]["rawTime"])[:4]:
            gm = g["metrics"]
            print(f"    {gm['rawTime'] / tot * 100:6.2f}%  "
                  f"{g['name'][:70]} (n={gm.get('occurrences')})")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 12)
