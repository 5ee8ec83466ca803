#!/usr/bin/env python3
"""Per-query diff of two graft Bench JSON artifacts.

Usage:
  python3 tools/benchdiff.py OLD.json NEW.json [ratio_flag]

OLD/NEW are Bench outputs (`bench_latest.json` or a driver `BENCH_rNN.json`
whose captured line may be truncated — a file that fails to parse as a whole
is scanned for the LAST parseable `{"metric":...}` line instead). Prints the
queries present in both, sorted by new/old ratio, flags anything slower than
`ratio_flag` (default 1.3), and lists queries only in one file. Sub-100ms
queries are never flagged (pure jitter). Exit code 1 when a flagged
regression exists, so the round workflow can gate on it.

Wall-clock totals are compared ONLY over the shared query set: totals over
different registries measure registry growth, not performance.
"""
import json
import sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    # driver tail-capture file: find the last parseable metric line
    best = None
    for line in raw.splitlines():
        line = line.strip()
        if '"metric"' not in line:
            continue
        start = line.find("{")
        if start < 0:
            continue
        try:
            d = json.loads(line[start:])
            if isinstance(d, dict) and "queries" in d:
                best = d
        except json.JSONDecodeError:
            continue
    if best is None:
        sys.exit(f"benchdiff: no parseable bench JSON in {path}")
    return best


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    if old.get("sf") != new.get("sf"):
        print(f"NOTE: different sf dirs ({old.get('sf')} vs {new.get('sf')}) "
              "— ratios are not comparable across scale factors")
    shared = sorted(set(oq) & set(nq))
    rows = []
    for q in shared:
        o, n = oq[q], nq[q]
        ratio = n / o if o > 0 else float("inf")
        rows.append((ratio, q, o, n))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] >= flag and r[3] >= 0.1]
    # Bench self-reports per-query sample spread (its noise meter; since r11
    # the map is SPARSE — an absent entry means the samples agreed within
    # 1.5x). A flag is annotated when EITHER artifact's own samples
    # disagreed by >= the flag ratio: a noisy OLD measurement inflates the
    # old min just as misleadingly as a noisy new one, so the measurement,
    # not the code, is the likely cause either way.
    os_, ns_ = old.get("spread", {}), new.get("spread", {})
    print(f"{len(shared)} shared queries "
          f"(old has {len(oq)}, new has {len(nq)}); flag ratio {flag}")
    print(f"{'ratio':>7}  {'old_s':>8}  {'new_s':>8}  {'spread':>6}  query")
    for ratio, q, o, n in rows:
        worst = max(os_.get(q, 1.0), ns_.get(q, 1.0))
        mark = " <-- FLAG" if (ratio, q, o, n) in flagged else ""
        if mark and worst >= flag:
            mark += " (noisy samples — suspect the host first)"
        sp = f"{worst:6.2f}" if (q in os_ or q in ns_) else "     -"
        print(f"{ratio:7.2f}  {o:8.3f}  {n:8.3f}  {sp}  {q}{mark}")
    tot_o = sum(oq[q] for q in shared)
    tot_n = sum(nq[q] for q in shared)
    print(f"shared-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)" if tot_o > 0 else "")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("only in old:", ", ".join(only_old))
    if only_new:
        print("only in new:", ", ".join(only_new))
    for side, d in (("old", old), ("new", new)):
        if d.get("failed"):
            print(f"{side} failed queries:", d["failed"])
        # samples map (r11+): successful-sample count where it differs from
        # `passes` — below means partial failures (flaky query), above means
        # the adaptive re-sampler ran (noisy measurement)
        p = d.get("passes")
        for q, cnt in sorted(d.get("samples", {}).items()):
            kind = "partial failures" if (p and cnt < p) else "re-sampled"
            print(f"{side} {q}: {cnt} samples ({kind})")
    if flagged:
        print(f"{len(flagged)} flagged regression(s) >= {flag}x "
              "(re-run before concluding: bench is order/GC sensitive)")
        sys.exit(1)


if __name__ == "__main__":
    main()
