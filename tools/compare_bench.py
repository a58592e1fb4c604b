#!/usr/bin/env python3
"""Diff two bench artifacts and triage movers: regression or co-tenant load?

Usage: python3 tools/compare_bench.py <old_bench.json> <new_bench.json> [threshold]

Encodes the BENCHNOTES drift-triage discipline as a tool:
  - a REAL regression is query-local: one query (or one operator family
    that shares changed code) moves while unrelated queries hold;
  - co-tenant load is broad and shape-blind: many unrelated queries move
    together, trivial control-table queries (stable sub-0.3 s floors)
    spike 3-10x, and movers cluster in contiguous ALPHABETICAL stretches
    (queries run alphabetically, so a load burst hits a run-order window,
    not a code family).

Output: per-mover lines plus a verdict block with the three signature
tests. Exit code 0 always (informational tool, not a gate).
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    old = json.load(open(old_path)).get("queries", {})
    new = json.load(open(new_path)).get("queries", {})
    shared = sorted(k for k in old if k in new)
    if not shared:
        print("no shared queries between the two artifacts")
        return

    movers = [(new[k] - old[k], k) for k in shared
              if new[k] - old[k] > threshold]
    movers.sort(reverse=True)
    total_old = sum(old[k] for k in shared)
    total_new = sum(new[k] for k in shared)
    print(f"shared={len(shared)} total {total_old:.1f}s -> {total_new:.1f}s "
          f"(delta {total_new - total_old:+.1f}s); movers > {threshold}s: {len(movers)}")
    for d, k in movers[:20]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (+{d:.2f})")

    # Signature 1: breadth — what fraction of shared queries moved at all?
    moved_any = sum(1 for k in shared if new[k] - old[k] > 0.1)
    breadth = moved_any / len(shared)

    # Signature 2: trivial-query spikes — queries with a stable sub-0.3 s
    # old reading now 3x+ slower (control-table floors don't regress from
    # code; they spike from load).
    trivial_spikes = [k for k in shared
                      if old[k] < 0.3 and new[k] > max(3 * old[k], 0.6)]

    # Signature 3: alphabetical clustering — longest run of consecutive
    # (run-order) queries that all moved, vs the count expected if the
    # same number of movers were scattered.
    moved_flags = [new[k] - old[k] > threshold for k in shared]
    longest = run = 0
    for f in moved_flags:
        run = run + 1 if f else 0
        longest = max(longest, run)

    # Two-segment prefix for the llm_/ann_/dedup_/mm_ namespaces — a
    # one-segment key makes every llm_* query one "family" and lets a
    # FAMILY-LOCAL verdict fire for unrelated queries sharing the prefix.
    def family(k):
        parts = k.split("_")
        wide = {"llm", "ann", "dedup", "mm", "ev", "stream"}
        return "_".join(parts[:2]) if parts[0] in wide and len(parts) > 1 else parts[0]

    fam = {}
    for d, k in movers:
        fam.setdefault(family(k), []).append(k)
    fam_top = max(fam.items(), key=lambda kv: len(kv[1]), default=(None, []))

    print("\nsignature tests:")
    print(f"  breadth: {moved_any}/{len(shared)} queries moved >0.1s "
          f"({100 * breadth:.0f}%)")
    print(f"  trivial-query spikes (old<0.3s, now 3x+): {len(trivial_spikes)} "
          f"{trivial_spikes[:6]}")
    print(f"  longest consecutive run-order mover stretch: {longest}")
    if fam_top[0]:
        print(f"  largest mover family: {fam_top[0]} ({len(fam_top[1])} queries)")

    load = (breadth > 0.25) or (len(trivial_spikes) >= 3) or (longest >= 6)
    single_family = fam_top[0] and len(fam_top[1]) == len(movers) and len(movers) > 0
    if not movers:
        verdict = "NO MOVERS — clean comparison"
    elif load:
        verdict = ("CO-TENANT SIGNATURE — broad/trivial/clustered movement; "
                   "re-run in a quiet window before believing any regression")
    elif single_family:
        verdict = (f"FAMILY-LOCAL ({fam_top[0]}) — consistent with a code "
                   "change to that family; confirm with SPARK_GRAFT_ONLY repeats")
    else:
        verdict = ("MIXED — a few scattered movers; confirm each with "
                   "SPARK_GRAFT_ONLY same-window repeats before acting")
    print(f"\nverdict: {verdict}")


if __name__ == "__main__":
    main()
