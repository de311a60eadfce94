#!/usr/bin/env python3
"""Diff two graft.ScaleAudit dumps (small SF vs large SF) into per-query
resource scaling slopes. Flags queries whose shuffle bytes grew more
than FLAG_RATIO x across the SF step (default 15x for a 10x data step —
superlinear beyond noise) with enough absolute volume to matter.

Usage: python3 tools/scale_slopes.py small.json large.json [flag_ratio]
"""
import json
import sys

SMALL, LARGE = sys.argv[1], sys.argv[2]
FLAG_RATIO = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
MIN_LARGE_BYTES = 16 * 1024 * 1024  # ignore sub-16MB shuffles: fixed overhead

small = json.load(open(SMALL))["queries"]
large = json.load(open(LARGE))["queries"]

rows = []
for name in sorted(large):
    if name not in small:
        continue
    s, l = small[name], large[name]
    if not (s["ok"] and l["ok"]):
        rows.append((name, None, s, l))
        continue
    ratio = (l["shuffle_bytes"] / s["shuffle_bytes"]) if s["shuffle_bytes"] else (
        float("inf") if l["shuffle_bytes"] else 1.0)
    rows.append((name, ratio, s, l))

flagged = [(n, r, s, l) for n, r, s, l in rows
           if r is not None and r > FLAG_RATIO
           and l["shuffle_bytes"] >= MIN_LARGE_BYTES]
spilled = [(n, s, l) for n, _, s, l in rows
           if l["disk_spill"] + l["mem_spill"] > 0]
win0 = [(n, l) for n, _, _, l in rows if l["unpartitioned_windows"] > 0]
ex1 = [(n, l) for n, _, _, l in rows if l["single_partition_exchanges"] > 0]
failures = [n for n, r, _, _ in rows if r is None]

print(f"queries compared: {len(rows)}   flag ratio: >{FLAG_RATIO}x "
      f"and >={MIN_LARGE_BYTES >> 20}MB at large SF")
print(f"\n== SUPERLINEAR SHUFFLE ({len(flagged)}) ==")
for n, r, s, l in sorted(flagged, key=lambda t: -t[1]):
    print(f"  {n}: {s['shuffle_bytes'] / 1e6:.1f}MB -> "
          f"{l['shuffle_bytes'] / 1e6:.1f}MB  ({r:.1f}x)")
print(f"\n== ANY SPILL AT LARGE SF ({len(spilled)}) ==")
for n, s, l in sorted(spilled, key=lambda t: -(t[2]['disk_spill'] + t[2]['mem_spill']))[:20]:
    print(f"  {n}: disk={l['disk_spill'] / 1e6:.1f}MB mem={l['mem_spill'] / 1e6:.1f}MB")
print(f"\n== UNPARTITIONED WINDOWS ({len(win0)}) ==")
for n, l in win0:
    print(f"  {n}: {l['unpartitioned_windows']} window(s), "
          f"shuffle {l['shuffle_bytes'] / 1e6:.1f}MB")
print(f"\n== SINGLE-PARTITION EXCHANGES ({len(ex1)}) ==")
for n, l in ex1:
    print(f"  {n}: {l['single_partition_exchanges']} exchange(s)")
if failures:
    print(f"\n== FAILURES == {failures}")

# top movers table (informational)
print("\n== TOP 15 BY LARGE-SF SHUFFLE ==")
ok = [(n, r, s, l) for n, r, s, l in rows if r is not None]
for n, r, s, l in sorted(ok, key=lambda t: -t[3]["shuffle_bytes"])[:15]:
    print(f"  {n}: {l['shuffle_bytes'] / 1e6:8.1f}MB  ratio {r:5.1f}x  "
          f"peak_task_mem {l['peak_task_mem'] / 1e6:.0f}MB")
