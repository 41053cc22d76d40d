#!/usr/bin/env python3
"""Aggregate [bench-phase] stderr lines (SPARK_GRAFT_BENCH_PHASES=1) into a
per-query driver-phase attribution table.

Each line looks like:
  [bench-phase] q=q01_char_count fn=save total=123ms parsing=1ms analysis=20ms
                optimization=30ms planning=10ms
(phase keys vary; `total` is the action's full execution wall including job
run time; the named phases are the QueryPlanningTracker's driver-side spans).

Usage: phase_report.py <bench-stderr-log> [--top N]
Prints per-query sums (a query can run several actions) and the aggregate
decomposition over all queries plus the sub-second tail, answering "how much
of the per-query floor is driver planning vs execution".
"""
import re
import sys
from collections import defaultdict

LINE = re.compile(r"\[bench-phase\] q=(\S+) fn=(\S+) total=(\d+)ms (.*)")
KV = re.compile(r"(\w+)=(\d+)ms")


def main() -> None:
    path = sys.argv[1]
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25
    per_q = defaultdict(lambda: defaultdict(int))
    for raw in open(path, errors="replace"):
        m = LINE.search(raw)
        if not m:
            continue
        q, _fn, total, rest = m.group(1), m.group(2), int(m.group(3)), m.group(4)
        per_q[q]["total"] += total
        per_q[q]["actions"] += 1
        for k, v in KV.findall(rest):
            per_q[q][k] += int(v)

    phases = sorted({k for d in per_q.values() for k in d
                     if k not in ("total", "actions")})

    def row(q, d):
        planned = sum(d.get(p, 0) for p in phases)
        return (q, d["actions"], d["total"], planned, d["total"] - planned,
                *(d.get(p, 0) for p in phases))

    rows = [row(q, d) for q, d in per_q.items()]
    hdr = ["query", "acts", "total_ms", "driver_phases_ms", "exec_ms"] + phases
    print("\t".join(hdr))
    for r in sorted(rows, key=lambda r: -r[3])[:top]:
        print("\t".join(str(x) for x in r))

    def agg(sel, label):
        tot = sum(r[2] for r in sel)
        ph = sum(r[3] for r in sel)
        n = len(sel)
        if n == 0:
            return
        print(f"{label}: n={n} total={tot/1000:.1f}s driver_phases={ph/1000:.1f}s "
              f"({100.0*ph/max(tot,1):.0f}%) exec={(tot-ph)/1000:.1f}s")
        for p in phases:
            s = sum(per_q[r[0]].get(p, 0) for r in sel)
            print(f"  {p}: {s/1000:.2f}s")

    print()
    agg(rows, "ALL")
    agg([r for r in rows if r[2] < 800], "SUB-0.8s-TOTAL (per-query action sum)")


if __name__ == "__main__":
    main()
