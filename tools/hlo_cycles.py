"""Offline attribution of a dumped TPU HLO module by compiler cycle estimates.

Parses the `estimated_cycles` field each TPU backend_config carries and
aggregates per op class and per source location — a profiler-free way to
see where a compiled step spends its time (the remote profiler rejects the
train graph, 2026-08-18). Estimates are the XLA TPU cost model's, not
measurements; treat ranks, not absolute ms, as the signal.

Usage: python tools/hlo_cycles.py /tmp/gb_hlo_train.txt [top_n]
"""

import collections
import re
import sys


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    text = open(path).read()

    # one HLO instruction per line in the dump
    op_re = re.compile(r"%(\S+?) = .*?estimated_cycles\":\"(\d+)\"")
    meta_re = re.compile(
        r'op_name="([^"]*)".*?source_file="([^"]*)".*?source_line=(\d+)'
    )

    by_class = collections.Counter()
    by_src = collections.Counter()
    rows = []
    seen = set()
    for line in text.splitlines():
        m = op_re.search(line)
        if not m:
            continue
        name, cyc = m.group(1), int(m.group(2))
        # fused computations repeat the estimate on body lines; count the
        # fusion root (the `= ... fusion(...)` / custom-call line) only
        if name in seen or " fusion(" not in line and "custom-call" not in line and " = " not in line:
            continue
        seen.add(name)
        cls = name.split(".")[0]
        by_class[cls] += cyc
        mm = meta_re.search(line)
        src = "?"
        opn = ""
        if mm:
            opn = mm.group(1).split("/")[-1]
            src = f"{mm.group(2).split('/')[-1]}:{mm.group(3)}"
        rows.append((cyc, name, opn, src))
        by_src[src] += cyc

    tot = sum(c for c, *_ in rows)
    hz = 0.94e9  # v5e TensorCore clock
    print(f"total estimated: {tot/hz*1e3:.1f} ms ({len(rows)} ops)")
    print("\n-- by op class --")
    for cls, cyc in by_class.most_common(top_n):
        print(f"  {cyc/hz*1e3:8.2f} ms  {cls}")
    print("\n-- by source line --")
    for src, cyc in by_src.most_common(top_n):
        print(f"  {cyc/hz*1e3:8.2f} ms  {src}")
    print("\n-- top individual ops --")
    for cyc, name, opn, src in sorted(rows, reverse=True)[:top_n]:
        print(f"  {cyc/hz*1e3:8.2f} ms  {name}  [{opn}]  {src}")


if __name__ == "__main__":
    main()
