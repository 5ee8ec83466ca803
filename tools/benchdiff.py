#!/usr/bin/env python3
"""Per-query diff of two graft Bench JSON artifacts.

Usage:
  python3 tools/benchdiff.py OLD.json NEW.json [ratio_flag]

OLD/NEW are Bench outputs in any of their historical shapes:
  - the repo-root full line (`bench_latest.json`),
  - a raw one-line Bench stdout capture,
  - a driver `BENCH_rNN.json` wrapper ({"n":…,"rc":…,"tail":"…"}) whose
    `tail` holds only the LAST ~2000 chars of the line — the per-field
    recovery below reconstructs whatever maps survive in the fragment
    (since r11 the line orders the compact per-query map last, so the
    tail always contains every per-query timing).

Query names are normalized to their `qNN` prefix before matching: r11+
artifacts key the per-query map by the prefix alone (the full-name map
cannot fit the driver's tail window), while older artifacts and the
spread/samples/failed fields carry full registry names. The report prints
the longest name either side knows.

Prints the queries present in both, sorted by new/old ratio, flags anything
slower than `ratio_flag` (default 1.3), and lists queries only in one file.
Sub-100ms queries are never flagged (pure jitter). Exit code 1 when a
flagged regression exists, so the round workflow can gate on it.

Wall-clock totals are compared ONLY over the shared query set: totals over
different registries measure registry growth, not performance.
"""
import json
import re
import sys


def parse_metric_text(text):
    """Parse a Bench metric line, whole or tail-truncated.

    A complete line parses directly. For a truncated fragment, each known
    map field is recovered independently by locating its key and
    raw-decoding the first complete JSON value after it — so a tail that
    lost the line's head still yields whatever maps survive in full.
    """
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    dec = json.JSONDecoder()
    out = {}
    spans = []  # (start, end) of recovered values, for the orphan scan
    for field in ("queries", "spread", "samples", "skipped", "failed"):
        at = text.rfind('"%s":' % field)
        if at < 0:
            continue
        vstart = at + len(field) + 3
        try:
            val, vend = dec.raw_decode(text[vstart:])
            out[field] = val
            spans.append((at, vstart + vend))
        except json.JSONDecodeError:
            continue
    m = re.search(r'"sf":("[^"]*")', text)
    if m:
        out["sf"] = json.loads(m.group(1))
    m = re.search(r'"passes":(\d+)', text)
    if m:
        out["passes"] = int(m.group(1))
    if "queries" not in out:
        # A tail can start MID-map, the map's own key cut off. Blank the
        # spans recovered above; any orphan "qNN...":number pairs left are
        # a truncated map's survivors — but WHICH map? The spread map's
        # entries look exactly like timings (r10's artifact truncated
        # mid-spread, and reading noise ratios as seconds would be worse
        # than refusing). The line's field order disambiguates: a queries
        # fragment is followed by "passes"/"spread" (pre-r11 order) or by
        # nothing (r11 puts queries last); a spread/samples fragment is
        # followed by "samples"/"failed"/"skipped"/"sf".
        blanked = list(text)
        for s, e in spans:
            blanked[s:e] = " " * (e - s)
        blanked = "".join(blanked)
        pairs = list(re.finditer(r'"(q\d+[^"]*)":(\d+(?:\.\d+)?)', blanked))
        if pairs:
            after = blanked[pairs[-1].end():]
            nxt = re.search(r'"(passes|spread|samples|failed|skipped|sf)":',
                            after)
            if nxt is None or nxt.group(1) in ("passes", "spread"):
                out["queries"] = {m.group(1): float(m.group(2)) for m in pairs}
                out["partial"] = True
    return out if "queries" in out else None


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict):
            if "queries" in d:
                return d
            if isinstance(d.get("tail"), str):  # driver BENCH_rNN wrapper
                got = parse_metric_text(d["tail"])
                if got is not None:
                    got.setdefault("sf", d.get("sf"))
                    return got
                sys.exit(f"benchdiff: {path} is a driver wrapper but its "
                         "tail holds no complete per-query map")
    except json.JSONDecodeError:
        pass
    # raw stdout capture: find the last line yielding a per-query map.
    # COMPLETE parses outrank partial ones regardless of order: a later
    # log line carrying orphan "qNN":number text (a spread fragment, a
    # progress echo) can partial-parse, and letting it supersede an
    # earlier complete metric line would silently swap the real timings
    # for noise. A partial result is used only when NO line in the
    # capture parsed complete.
    best_complete = None
    best_partial = None
    complete_at = partial_at = -1
    for idx, line in enumerate(raw.splitlines()):
        start = line.find("{")
        if start < 0:
            continue
        got = parse_metric_text(line[start:])
        if got is None:
            continue
        if got.get("partial"):
            best_partial, partial_at = got, idx
        else:
            best_complete, complete_at = got, idx
    best = best_complete or best_partial
    if best is best_complete and partial_at > complete_at >= 0:
        # the chosen complete line is OLDER than a partial-parsing line
        # further down — usually orphan noise, but if this capture holds
        # several runs the superseded line could be the LATEST run cut
        # mid-map, and diffing a stale run with full confidence is worse
        # than saying so
        print(f"NOTE: {path}: kept the complete metric line (line "
              f"{complete_at + 1}) over a later partial parse (line "
              f"{partial_at + 1}) — if this capture holds more than one "
              "bench run, the kept line may be from an earlier run")
    if best is None:
        best = parse_metric_text(raw)
    if best is None:
        sys.exit(f"benchdiff: no parseable bench JSON in {path}")
    return best


def norm(name):
    """qNN prefix — the identity stable across full-name and compact keys."""
    head = name.split("_", 1)[0]
    return head if re.fullmatch(r"q\d+", head) else name


def norm_map(d, collided=None, origin=None, keep_full=None):
    # Two distinct names sharing a qNN prefix must NOT collapse into one
    # key (last-wins would silently drop a timing) — Bench keeps full
    # names for colliding prefixes on the emit side, so the diff side
    # mirrors that: colliding groups keep their full spellings. When a
    # prefix collides on ONE side only (old registry had one q09, new
    # grew q09_a + q09_b), the keys can never meet in the shared set —
    # the caller passes `collided` to collect those prefixes and handle
    # the group (recover an exact-spelling match or exclude it loudly),
    # and `origin` to remember which full spelling each compacted
    # single-member key came from (so recovery can re-key it).
    # `keep_full` carries prefixes ALREADY known to collide in this
    # side's QUERY map: a sparse spread map usually holds one entry of a
    # colliding group (only the noisy member crossed the emit cutoff),
    # and compacting that lone entry to the bare prefix would detach it
    # from its full-spelling query key — the flag it annotates would
    # print spread "-" with no noise warning.
    d = d or {}
    groups = {}
    for k in d:
        groups.setdefault(norm(k), []).append(k)
    out = {}
    for nk, ks in groups.items():
        if len(ks) == 1 and nk not in (keep_full or ()):
            out[nk] = d[ks[0]]
            if origin is not None:
                origin[nk] = ks[0]
        else:
            if collided is not None:
                collided.setdefault(nk, []).extend(sorted(ks))
            for k in ks:
                out[k] = d[k]
    return out


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, new = load(old_path), load(new_path)
    o_coll, n_coll, o_orig, n_orig = {}, {}, {}, {}
    oq = norm_map(old["queries"], o_coll, o_orig)
    nq = norm_map(new["queries"], n_coll, n_orig)
    # spread maps normalized the same way as the query maps so their keys
    # stay aligned — with each side's own query-map collisions passed as
    # keep_full, so a lone spread entry on a COLLIDING side keeps the full
    # spelling its query key kept (compacted, it would miss the
    # os_.get(full_name) lookup and the flag would lose its noise
    # annotation). Compacted-side entries are re-keyed in the collision
    # recovery below instead.
    os_ = norm_map(old.get("spread"), keep_full=set(o_coll))
    ns_ = norm_map(new.get("spread"), keep_full=set(n_coll))
    # One-side-only prefix collisions: that side keeps full names, the
    # other side's single entry was compacted to the bare prefix. If the
    # compacted entry's ORIGINAL spelling names one of the colliding full
    # names, the match is not ambiguous at all — re-key it back to its
    # full spelling so the pair meets in the shared set (the group's other
    # members land in only-in as genuinely unmatched). Otherwise the group
    # really is ambiguous: say so, and actually EXCLUDE it — drop the keys
    # from both maps so they can't triple-report via the only-in lists.
    for p in sorted(set(o_coll) | set(n_coll)):
        if p in o_coll and p in n_coll:
            continue  # full spellings on both sides meet on their own
        side = "old" if p in o_coll else "new"
        coll_names = o_coll.get(p) or n_coll.get(p)
        other_map, other_orig = (nq, n_orig) if side == "old" else (oq, o_orig)
        if p not in other_map:
            continue  # the other side lacks the prefix entirely — plain only-in
        spelling = other_orig.get(p)
        if spelling in coll_names:
            other_map[spelling] = other_map.pop(p)
            # the same artifact's spread entry (if any) follows its query
            # key: it describes the same single full-named query
            other_spread = ns_ if side == "old" else os_
            if p in other_spread:
                other_spread[spelling] = other_spread.pop(p)
            print(f"NOTE: prefix {p} collides in {side} only — matched the "
                  f"other side's entry by its full spelling {spelling}")
        else:
            print(f"WARNING: prefix {p} collides in {side} only "
                  f"({', '.join(coll_names)}) — group excluded from the "
                  "comparison (no exact-spelling match for the other "
                  f"side's single {p} timing)")
            coll_map = oq if side == "old" else nq
            for k in coll_names:
                coll_map.pop(k, None)
            other_map.pop(p, None)
    # longest spelling seen anywhere, for display
    names = {}
    for d in (old, new):
        for field in ("queries", "spread", "samples"):
            for k in (d.get(field) or {}):
                if len(k) > len(names.get(norm(k), "")):
                    names[norm(k)] = k
    # a collided prefix's full spellings are distinct keys in their own
    # right — rewriting the other side's compact key to one of them would
    # print e.g. old's lone q09 as "q09_a"
    for p in set(o_coll) | set(n_coll):
        names.pop(p, None)
    if old.get("sf") != new.get("sf"):
        print(f"NOTE: different sf dirs ({old.get('sf')} vs {new.get('sf')}) "
              "— ratios are not comparable across scale factors")
    for side, d in (("old", old), ("new", new)):
        if d.get("partial"):
            print(f"NOTE: {side} artifact was tail-truncated mid-map — only "
                  f"{len(d['queries'])} per-query timings recovered")
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
    # the emit cutoff: 1.3x since r12, 1.5x in the r11 artifact — so an
    # r11-era flag in the 1.3-1.49x band can lack its noise annotation).
    # A flag is annotated when EITHER artifact's own samples
    # disagreed by >= the flag ratio: a noisy OLD measurement inflates the
    # old min just as misleadingly as a noisy new one, so the measurement,
    # not the code, is the likely cause either way. (os_/ns_ were
    # normalized next to the query maps, before collision re-keying.)
    print(f"{len(shared)} shared queries "
          f"(old has {len(oq)}, new has {len(nq)}); flag ratio {flag}")
    print(f"{'ratio':>7}  {'old_s':>8}  {'new_s':>8}  {'spread':>6}  query")
    for ratio, q, o, n in rows:
        worst = max(os_.get(q, 1.0), ns_.get(q, 1.0))
        mark = " <-- FLAG" if (ratio, q, o, n) in flagged else ""
        if mark and worst >= flag:
            mark += " (noisy samples — suspect the host first)"
        sp = f"{worst:6.2f}" if (q in os_ or q in ns_) else "     -"
        print(f"{ratio:7.2f}  {o:8.3f}  {n:8.3f}  {sp}  {names.get(q, q)}{mark}")
    tot_o = sum(oq[q] for q in shared)
    tot_n = sum(nq[q] for q in shared)
    print(f"shared-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)" if tot_o > 0 else "")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("only in old:", ", ".join(names.get(q, q) for q in only_old))
    if only_new:
        print("only in new:", ", ".join(names.get(q, q) for q in only_new))
    for side, d in (("old", old), ("new", new)):
        if d.get("failed"):
            print(f"{side} failed queries:", d["failed"])
        # samples map (r11+): emitted for any query whose run was not the
        # plain `passes` clean passes — below `passes` means partial
        # failures (flaky query), above means the adaptive re-sampler ran
        # (noisy measurement), exactly `passes` means both (a failed pass
        # whose re-samples landed the count back at passes)
        p = d.get("passes")
        for q, cnt in sorted((d.get("samples") or {}).items()):
            kind = ("partial failures" if (p and cnt < p)
                    else "failed pass + re-sampled" if (p and cnt == p)
                    else "re-sampled")
            print(f"{side} {q}: {cnt} samples ({kind})")
    if flagged:
        print(f"{len(flagged)} flagged regression(s) >= {flag}x "
              "(re-run before concluding: bench is order/GC sensitive)")
        sys.exit(1)


if __name__ == "__main__":
    main()
