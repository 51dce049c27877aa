#!/usr/bin/env python3
"""Merge a bench_detail.json run into PERF.json, the machine-readable
per-query perf ledger (best-known isolated sf0.1 seconds).

The ledger only absorbs runs at sf0.1 and takes the per-query MIN of the
existing entry and the run's queries_isolated — a loaded box can never
worsen the ledger, only a genuinely better plan can improve it. Queries
that failed in the run (sentinel 9999.0) are skipped.

Usage: python3 scripts/update_perf_ledger.py [bench_detail.json] [--round rN]
"""
import json
import sys
from pathlib import Path

argv = sys.argv[1:]
rnd = "unknown"
if "--round" in argv:
    i = argv.index("--round")
    rnd = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
detail_path = Path(argv[0] if argv else "bench_detail.json")
ledger_path = Path("PERF.json")

detail = json.loads(detail_path.read_text())
if not str(detail.get("sf", "")).endswith("0.1"):
    sys.exit(f"refusing: run sf={detail.get('sf')} is not sf0.1")
run = {k: float(v) for k, v in detail["queries_isolated"].items()
       if float(v) < 9000.0}

if ledger_path.exists():
    ledger = json.loads(ledger_path.read_text())
else:
    ledger = {"unit": "sec", "channel": "sf0.1_isolated", "queries": {}}

q = ledger["queries"]
improved, added = [], []
for name, sec in sorted(run.items()):
    if name not in q:
        q[name] = round(sec, 3)
        added.append(name)
    elif sec < q[name]:
        improved.append((name, q[name], sec))
        q[name] = round(sec, 3)
ledger["updated"] = rnd
ledger["n_queries"] = len(q)
ledger_path.write_text(json.dumps(ledger, indent=0, sort_keys=True) + "\n")
print(f"ledger: {len(q)} queries ({len(added)} added, {len(improved)} improved)")
for name, old, new in improved[:20]:
    print(f"  {name}: {old:.3f} -> {new:.3f}")
