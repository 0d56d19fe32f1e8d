#!/usr/bin/env python3
"""Summarize the round-5 scaling legs (BENCH/legs_r5.jsonl 8/32 hunt +
BENCH/legs_r5_small.jsonl 2/8 below-ceiling pairs): per-side leg tables,
clean legs (total_steal_sec < 25), best-pair and cleanest-pair raw
efficiencies. Prints markdown for BENCH/BASELINE.md.
"""
import json, sys

def load(path):
    try:
        return [json.loads(l) for l in open(path)]
    except FileNotFoundError:
        return []

def side(ls, c):
    return sorted([l for l in ls if l["cpus"] == c], key=lambda d: -d["docs_per_sec"])

def fmt_attempts(sub):
    return ", ".join(f"{l['docs_per_sec']:,.0f} ({l['total_steal_sec']:.0f}s)"
                     for l in sub)

def pair_eff(lo, hi, ratio):
    return (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio

def report(name, ls, a, b):
    A, B = side(ls, a), side(ls, b)
    if not A or not B:
        print(f"{name}: missing a side ({len(A)} vs {len(B)})"); return
    print(f"## {name}: local[{a}] n={len(A)}, local[{b}] n={len(B)}")
    print(f"| parallelism | best docs/sec | all attempts (docs/sec, total steal during leg) |")
    print(f"|---|---|---|")
    print(f"| local[{a}]  | {A[0]['docs_per_sec']:,.0f} | {fmt_attempts(A)} |")
    print(f"| local[{b}] | {B[0]['docs_per_sec']:,.0f} | {fmt_attempts(B)} |")
    cleanA = [l for l in A if l["total_steal_sec"] < 25]
    cleanB = [l for l in B if l["total_steal_sec"] < 25]
    print(f"clean (<25 CPU-s steal): {a}-side {len(cleanA)}, {b}-side {len(cleanB)}")
    r = b / a
    print(f"best-pair raw eff: ({B[0]['docs_per_sec']:,.0f} / {A[0]['docs_per_sec']:,.0f}) / {r:.0f} = {pair_eff(A[0], B[0], r):.3f}"
          f"  [steal {A[0]['total_steal_sec']:.0f}s / {B[0]['total_steal_sec']:.0f}s]")
    qA = min(A, key=lambda d: d["total_steal_sec"])
    qB = min(B, key=lambda d: d["total_steal_sec"])
    print(f"cleanest-pair raw eff: ({qB['docs_per_sec']:,.0f} / {qA['docs_per_sec']:,.0f}) / {r:.0f} = {pair_eff(qA, qB, r):.3f}"
          f"  [steal {qA['total_steal_sec']:.0f}s / {qB['total_steal_sec']:.0f}s]")
    if cleanA and cleanB:
        bA = max(cleanA, key=lambda d: d["docs_per_sec"])
        bB = max(cleanB, key=lambda d: d["docs_per_sec"])
        print(f"CLEAN-pair raw eff: ({bB['docs_per_sec']:,.0f} / {bA['docs_per_sec']:,.0f}) / {r:.0f} = {pair_eff(bA, bB, r):.3f}"
              f"  [steal {bA['total_steal_sec']:.0f}s / {bB['total_steal_sec']:.0f}s]")
    print()

def adjacent_pairs(name, ls, a, b, max_gap=1200):
    """The collector alternates sides, so a leg and its nearest
    opposite-side neighbour in time ran under (approximately) the same
    co-tenant steal regime. Pair each local[b] leg with the nearest
    local[a] leg within max_gap seconds and report the per-pair
    efficiency distribution — a steal-robust complement to best-vs-best.
    """
    A = sorted([l for l in ls if l["cpus"] == a], key=lambda d: d["leg_ts"])
    B = sorted([l for l in ls if l["cpus"] == b], key=lambda d: d["leg_ts"])
    if not A or not B:
        return
    r = b / a
    pairs = []
    for hb in B:
        la = min(A, key=lambda d: abs(d["leg_ts"] - hb["leg_ts"]))
        gap = abs(la["leg_ts"] - hb["leg_ts"])
        if gap <= max_gap:
            pairs.append((pair_eff(la, hb, r), la, hb, gap))
    if not pairs:
        print(f"adjacent pairs ({name}): none within {max_gap}s"); return
    effs = sorted(p[0] for p in pairs)
    med = effs[len(effs) // 2]
    calm = min(pairs, key=lambda p: p[1]["total_steal_sec"] + p[2]["total_steal_sec"])
    print(f"adjacent-pair eff ({name}, n={len(pairs)}, gap<= {max_gap}s): "
          f"median {med:.3f}, max {max(effs):.3f}, min {min(effs):.3f}")
    print(f"  calmest adjacent pair: eff {calm[0]:.3f} "
          f"[{a}-side {calm[1]['docs_per_sec']:,.0f} d/s steal {calm[1]['total_steal_sec']:.0f}s, "
          f"{b}-side {calm[2]['docs_per_sec']:,.0f} d/s steal {calm[2]['total_steal_sec']:.0f}s, "
          f"gap {calm[3]}s]")
    top = sorted(pairs, key=lambda p: -p[0])[:5]
    print("  top adjacent pairs: " + ", ".join(
        f"{p[0]:.3f} (steal {p[1]['total_steal_sec']:.0f}/{p[2]['total_steal_sec']:.0f}s)"
        for p in top))
    print()

def curve(all_legs):
    """Same-build best-leg scaling curve across every parallelism measured,
    with per-step efficiency (speedup / core ratio)."""
    best = {}
    for l in all_legs:
        c = l["cpus"]
        if c not in best or l["docs_per_sec"] > best[c]["docs_per_sec"]:
            best[c] = l
    cs = sorted(best)
    if len(cs) < 3:
        return
    print("## Same-build scaling curve (best leg per parallelism)")
    print("| cores | best docs/sec | leg steal | step | step eff |")
    print("|---|---|---|---|---|")
    prev = None
    for c in cs:
        l = best[c]
        if prev is None:
            step, eff = "—", "—"
        else:
            r = c / prev
            eff = f"{(l['docs_per_sec'] / best[prev]['docs_per_sec']) / r:.3f}"
            step = f"{prev}->{c}"
        print(f"| {c} | {l['docs_per_sec']:,.0f} | {l['total_steal_sec']:.0f}s | {step} | {eff} |")
        prev = c
    print()

legs = load("BENCH/legs_r5.jsonl")
small = load("BENCH/legs_r5_small.jsonl")
mid = load("BENCH/legs_r5_mid.jsonl")
shas = {l.get("git") for l in legs + small + mid}
print(f"builds: {shas}; workload: replicate=96 (480,000 docs, sf0.1), pipeline-only\n")
report("8 -> 32 (the contested 4x pair)", legs, 8, 32)
adjacent_pairs("8->32", legs, 8, 32)
report("2 -> 8 (below the host's oversubscription ceiling)", small, 2, 8)
adjacent_pairs("2->8", small, 2, 8)
curve(legs + small + mid)
