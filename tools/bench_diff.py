#!/usr/bin/env python3
"""Per-query benchmark regression guard: diff two BENCH_r{N}.json files
and flag regressions, so deliberate perf trades (e.g. swapping an
unbounded in-bucket expansion for skew-bounded triangle tasks) are
VISIBLE in review instead of silent.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold_pct]

Exit code is always 0 — the report is informational (local[32] at
sf0.1 has per-query jitter; the flag threshold, default 25%, is chosen
to sit above it). Queries present on only one side are listed as
added/removed, not regressions. See SCALING.md "Benchmark
interpretation: the per-query job floor" for why sub-0.3 s queries
are overhead-bound and how to read total-time deltas across rounds.
"""
import json
import sys


def load(path):
    """Accept either the driver's BENCH_r{N}.json wrapper (bench line
    under "parsed") or a raw one-line Bench stdout dump."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc.get("parsed"), dict):
        return doc["parsed"]
    if "queries" in doc:
        return doc
    # round-1-era wrapper with parsed=null: the bench line is embedded
    # in the captured stdout tail (possibly prefixed, e.g. by sbt)
    tail = doc.get("tail") or ""
    start = tail.find('{"metric"')
    if start >= 0:
        end = tail.find("\n", start)
        return json.loads(tail[start:end if end > 0 else len(tail)])
    # head-truncated tail (the driver keeps only the LAST N chars, so
    # the bench line may have lost its '{"metric"' prefix): reattach it
    start = tail.find(':"total"')
    if start >= 0:
        line = ('{"metric"' + tail[start:]).splitlines()[0]
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            pass
    # last resort: the clip landed INSIDE the queries map, so no JSON
    # reconstruction is possible — regex-salvage the intact per-query
    # pairs (a key clipped mid-name simply doesn't match) plus the
    # tail summary scalars, which Bench deliberately emits LAST so
    # they survive any head clip
    import re
    pairs = re.findall(r'"(q_\w+)":(-?\d+(?:\.\d+)?)', tail)
    if pairs:
        doc = {"queries": {k: float(v) for k, v in pairs},
               "salvaged": True}
        for key in ("min3", "value", "errs", "count", "runs"):
            m = re.search(rf'"{key}":(-?\d+(?:\.\d+)?)', tail)
            if m:
                doc[key] = float(m.group(1))
        m = re.search(r'"per_query":"([^"]+)"', tail)
        if m:
            doc["per_query"] = m.group(1)
        return doc
    raise SystemExit(f"{path}: neither a driver wrapper nor a bench line")


def main(old_path, new_path, threshold_pct=25.0):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    print(f"# bench diff: {old_path} -> {new_path}")
    print(f"total: {old.get('value', 0):.2f}s -> {new.get('value', 0):.2f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    # since round 10 the per-query map carries MIN-of-runs (ambient
    # machine phase muddied three rounds of single-run diffs); flag a
    # basis mismatch so a cross-era diff's downward shift reads as the
    # basis change it is, not a perf win
    po = old.get("per_query", "run-1")
    pn = new.get("per_query", "run-1")
    if po != pn:
        print(f"NOTE: per-query basis differs: {po} -> {pn} — expect a "
              "uniform shift; only relative per-query deltas are meaningful")
    if shared:
        so = sum(oq[q] for q in shared)
        sn = sum(nq[q] for q in shared)
        delta = f" ({(sn - so) / so * 100.0:+.1f}%)" if so > 0 else ""
        print(f"shared {len(shared)} queries: {so:.2f}s -> {sn:.2f}s{delta}")

    regressions = []
    improvements = []
    for q in shared:
        a, b = oq[q], nq[q]
        if a <= 0:
            continue
        pct = (b - a) / a * 100.0
        if pct >= threshold_pct and b - a >= 0.05:  # ignore sub-50ms jitter
            regressions.append((pct, q, a, b))
        elif pct <= -threshold_pct and a - b >= 0.05:
            improvements.append((pct, q, a, b))

    if regressions:
        print(f"\n## REGRESSIONS (> {threshold_pct:.0f}% and > 50 ms)")
        for pct, q, a, b in sorted(regressions, reverse=True):
            print(f"  {q}: {a:.3f}s -> {b:.3f}s ({pct:+.1f}%)")
    else:
        print(f"\nno regressions > {threshold_pct:.0f}%")
    if improvements:
        print(f"\n## improvements (> {threshold_pct:.0f}%)")
        for pct, q, a, b in sorted(improvements):
            print(f"  {q}: {a:.3f}s -> {b:.3f}s ({pct:+.1f}%)")
    if added:
        print(f"\n## added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"\n## removed ({len(removed)}): " + ", ".join(removed))


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 25.0)
