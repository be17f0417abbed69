#!/usr/bin/env python3
"""Per-query bench regression tracking across rounds.

Usage: bench_compare.py BASE CURRENT [noise_factor]

BASE / CURRENT are either driver-emitted BENCH_r*.json files (whose
per-query timings live in a possibly-truncated "tail" string) or a raw
one-line bench JSON captured locally (`sbt "runMain graft.Bench" | grep
-o '{"metric".*'` output saved to a file).

This VM's timings vary up to ~2x run-to-run, so the default noise factor
is 2.5: only ratios beyond it are flagged, and a flag means "re-run and
look", not "proven regression". Queries present on one side only are
listed as added/removed.
"""
import json, re, sys


def load(path):
    """Return {query: seconds} plus the total, tolerating the driver's
    truncated-tail capture (regex over the tail, not a JSON parse).

    Bench emits THREE lines since round 9 (compact top-10 / full map
    under "queries_full" / compact again), so a raw local capture is
    not single-line JSON anymore: parse every {"metric"...} line and
    keep the one with the MOST per-query timings — preferring
    "queries_full" over the compact "queries" — never the first line
    (which holds only the top-10)."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {"tail": raw}
    if isinstance(d, dict) and isinstance(d.get("queries_full"), dict):
        return {k: float(v) for k, v in d["queries_full"].items()}, d.get("value")
    blob = d.get("tail", "") if isinstance(d, dict) else raw
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        best = {k: float(v) for k, v in d["queries"].items()}, d.get("value")
    else:
        best = None
        if isinstance(d, dict) and d.get("parsed"):
            p = d["parsed"]
            if isinstance(p.get("queries"), dict):
                best = {k: float(v) for k, v in p["queries"].items()}, p.get("value")
    for line in re.findall(r'\{"metric"[^\n]*', blob):
        try:
            p = json.loads(line)
        except json.JSONDecodeError:
            continue
        qs = p.get("queries_full") or p.get("queries")
        if isinstance(qs, dict) and (best is None or len(qs) > len(best[0])):
            best = {k: float(v) for k, v in qs.items()}, p.get("value")
    # raw regex harvest last: a truncated tail may hold a PARTIAL big map
    # (hundreds of entries) alongside a complete compact line (10) — take
    # whichever recovers more per-query timings
    qs = {k: float(v) for k, v in re.findall(r'"(q_\w+)":([0-9.]+)', blob)}
    if best is None or len(qs) > len(best[0]):
        tot = re.search(r'"metric":"total","value":([0-9.]+)', blob)
        best = qs, (float(tot.group(1)) if tot else None)
    return best


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    base_path, cur_path = sys.argv[1], sys.argv[2]
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5
    base, base_total = load(base_path)
    cur, cur_total = load(cur_path)
    if not base or not cur:
        sys.exit(f"could not extract per-query timings (base={len(base)}, cur={len(cur)})")

    added = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    common = sorted(set(base) & set(cur))
    # sub-100ms timings are all scheduler jitter — compare against a floor
    floored = [(q, max(base[q], 0.1), max(cur[q], 0.1)) for q in common]
    ratios = sorted(((c / b, q, base[q], cur[q]) for q, b, c in floored), reverse=True)

    flagged = [r for r in ratios if r[0] > noise]
    print(f"base   : {base_path} ({len(base)} queries, total={base_total})")
    print(f"current: {cur_path} ({len(cur)} queries, total={cur_total})")
    if added:
        print(f"added  : {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    print(f"\nslowest movers (ratio floored at 0.1s; >{noise}x flagged):")
    for ratio, q, b, c in ratios[:10]:
        mark = " <-- FLAG" if ratio > noise else ""
        print(f"  {q:28s} {b:7.3f}s -> {c:7.3f}s  x{ratio:4.2f}{mark}")
    if flagged:
        print(f"\n{len(flagged)} flagged — re-run before believing (VM noise ~2x):")
        for ratio, q, b, c in flagged:
            print(f"  {q}")
        sys.exit(1)
    print("\nno regressions beyond the noise envelope")


if __name__ == "__main__":
    main()
