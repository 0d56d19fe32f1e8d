#!/usr/bin/env python3
"""Round-over-round per-query bench comparison (VERDICT r02 "do this" #1).

Loads per-query timings from:
  - BENCH_r01.json (driver file; its `parsed` was null, but the clean JSON
    line survives in `tail`)
  - BENCH_r02.json (`parsed` — known steal-contaminated window)
  - one or more current sweep JSON lines (BENCH/last.json or files given
    on argv), taking the per-query BEST across them

and flags any query whose current best exceeds 2x the best historical
timing. Exit code 1 if any flagged. Steal seconds per query are printed
when the current sweep carries them.

Usage: python3 tools/bench_compare.py [sweep.json ...]
"""
import json, re, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_driver(path):
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):  # raw Bench line (sweep files)
        return d
    p = d.get("parsed")
    if isinstance(p, dict) and p.get("queries"):
        return p
    m = re.search(r'\{"metric".*', d.get("tail", ""))
    if m:
        line = m.group(0).splitlines()[0]
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            pass
    return {"queries": {}}


def main():
    hist = {}
    import glob as _glob
    hist_files = ["BENCH_r01.json", "BENCH_r02.json", "BENCH_r03.json"] + \
        sorted(os.path.relpath(p, ROOT)
               for p in _glob.glob(os.path.join(ROOT, "BENCH", "sweep_r3_*.json")))
    for f in hist_files:
        p = os.path.join(ROOT, f)
        if not os.path.exists(p):
            continue
        qs = load_driver(p).get("queries", {})
        for q, v in qs.items():
            if v is not None and v >= 0:
                hist.setdefault(q, []).append((v, f))

    sweeps = sys.argv[1:] or [os.path.join(ROOT, "BENCH", "last.json")]
    cur, steal = {}, {}
    meta = []
    for path in sweeps:
        d = json.loads(open(path).read().strip().splitlines()[-1])
        meta.append((path, d.get("cpus"), d.get("total_steal_sec")))
        for q, v in d.get("queries", {}).items():
            if v is not None and v >= 0 and (q not in cur or v < cur[q]):
                cur[q] = v
        for q, v in d.get("steal_sec", {}).items():
            steal[q] = max(steal.get(q, 0.0), v)

    for path, cpus, ts in meta:
        print(f"sweep {path}: cpus={cpus} total_steal_sec={ts}")
    print(f"{'query':<28}{'current':>9}{'best-hist':>11}{'ratio':>7}  note")
    flagged = []
    for q in sorted(cur):
        h = min(hist.get(q, [(None, "")]))[0] if q in hist else None
        ratio = (cur[q] / h) if h else None
        note = ""
        if q in steal and steal[q] > 0.5:
            note += f" steal={steal[q]:.1f}s"
        if h is None:
            note += " (new this round)"
        elif ratio > 2.0:
            note += " ** >2x best historical"
            flagged.append(q)
        print(f"{q:<28}{cur[q]:>9.2f}{(f'{h:.2f}' if h else '-'):>11}"
              f"{(f'{ratio:.2f}' if ratio else '-'):>7} {note}")
    if flagged:
        print(f"\nFLAGGED (> 2x best historical): {', '.join(flagged)}")
        return 1
    print("\nOK: every query's best-of is within 2x its best historical timing")
    return 0


if __name__ == "__main__":
    sys.exit(main())
