#!/usr/bin/env python3
"""Self-test for benchdiff's artifact parsing and name normalization.

Covers the truncation scenarios the parser must distinguish (r10's official
artifact was truncated mid-SPREAD-map, which must refuse rather than read
noise ratios as seconds; r11's format puts the per-query map last, which
must recover fully). Run: `python3 tools/benchdiff_selftest.py` — prints
PASS/FAIL per case, exit 1 on any failure. The round workflow can gate on
it before trusting a cross-round diff.
"""
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
import benchdiff  # noqa: E402


FULL = (
    '{"metric":"total","value":3.0,"unit":"sec","passes":3,'
    '"spread":{"q01_alpha":1.61,"q02_beta":2.2},"samples":{"q02_beta":4},'
    '"failed":[],"skipped":{},"sf":"/root/testdata/sf0.1",'
    '"queries":{"q01":1.25,"q02":1.75}}'
)

# pre-r11 line: queries FIRST, then passes, spread, failed, skipped, sf
OLD_STYLE = (
    '{"metric":"total","value":3.0,"unit":"sec",'
    '"queries":{"q01_alpha":1.2,"q02_beta":1.8},"passes":3,'
    '"spread":{"q01_alpha":1.1,"q02_beta":9.45},"failed":[],'
    '"skipped":{},"sf":"/root/testdata/sf0.1"}'
)


def check(name, cond, detail=""):
    print(f"{'PASS' if cond else 'FAIL'}  {name}{'  ' + detail if detail else ''}")
    return bool(cond)


def main():
    ok = True

    # 1. complete line parses directly
    d = benchdiff.parse_metric_text(FULL)
    ok &= check("full line", d is not None and d["queries"] == {"q01": 1.25, "q02": 1.75})

    # 2. r11 tail truncated BEFORE the queries key: the intact
    #    "queries":{...} map at the end must recover, spread partially
    cut = FULL[FULL.find('"spread"') + 20:]
    d = benchdiff.parse_metric_text(cut)
    ok &= check("r11 tail (queries key intact)",
                d is not None and d["queries"] == {"q01": 1.25, "q02": 1.75})

    # 3. r11 tail truncated MID-queries: orphan pairs at end-of-text are a
    #    queries fragment (nothing follows) — partial recovery
    cut = FULL[FULL.find('"q02":'):]
    d = benchdiff.parse_metric_text(cut)
    ok &= check("r11 tail (mid-queries)",
                d is not None and d.get("partial") and d["queries"] == {"q02": 1.75})

    # 4. pre-r11 tail truncated MID-SPREAD (the r10 artifact): orphan pairs
    #    followed by "failed" are NOISE RATIOS, not timings — must refuse
    cut = OLD_STYLE[OLD_STYLE.find('"q02_beta":9.45'):]
    d = benchdiff.parse_metric_text(cut)
    ok &= check("pre-r11 tail (mid-spread refuses)", d is None,
                detail="" if d is None else f"wrongly parsed {d}")

    # 5. pre-r11 tail truncated MID-QUERIES: orphans followed by "passes"
    #    are timings — partial recovery
    cut = OLD_STYLE[OLD_STYLE.find('"q02_beta":1.8'):]
    d = benchdiff.parse_metric_text(cut)
    ok &= check("pre-r11 tail (mid-queries recovers)",
                d is not None and d.get("partial")
                and d["queries"] == {"q02_beta": 1.8})

    # 6. driver wrapper: tail string inside {"n":..,"tail":...}
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump({"n": 10, "rc": 0, "sf": 0.1, "tail": FULL[-80:]}, f)
        p = f.name
    d = benchdiff.load(p)
    ok &= check("driver wrapper", d["queries"] == {"q01": 1.25, "q02": 1.75})

    # 7. name normalization: full names and compact keys meet at the qNN
    #    prefix; colliding prefixes keep full spellings; non-qNN untouched
    nm = benchdiff.norm_map({"q01_alpha": 1.0, "q02": 2.0, "qtest_x": 3.0})
    ok &= check("norm_map basic", nm == {"q01": 1.0, "q02": 2.0, "qtest_x": 3.0})
    nm = benchdiff.norm_map({"q09_a": 1.0, "q09_b": 2.0})
    ok &= check("norm_map collision keeps full names",
                nm == {"q09_a": 1.0, "q09_b": 2.0})
    coll = {}
    benchdiff.norm_map({"q09_a": 1.0, "q09_b": 2.0, "q10_x": 3.0}, coll)
    ok &= check("norm_map reports colliding prefixes",
                coll == {"q09": ["q09_a", "q09_b"]})

    # 8. raw-stdout scan: a LATER line that only partial-parses (orphan
    #    qNN:number text, e.g. an echoed spread fragment) must not
    #    supersede an EARLIER complete metric line
    with tempfile.NamedTemporaryFile("w", suffix=".log", delete=False) as f:
        f.write("[info] running bench\n" + FULL + "\n"
                + '{"q01_alpha":9.45,"q02_beta":8.8}' + "\n[success] done\n")
        p = f.name
    d = benchdiff.load(p)
    ok &= check("stdout scan prefers complete over later partial",
                not d.get("partial")
                and d["queries"] == {"q01": 1.25, "q02": 1.75},
                detail="" if not d.get("partial") else f"partial won: {d}")
    # ... and a capture holding ONLY a partial line still recovers it
    with tempfile.NamedTemporaryFile("w", suffix=".log", delete=False) as f:
        f.write("[info] noise\n" + FULL[FULL.find('"q02":'):] + "\n")
        p = f.name
    d = benchdiff.load(p)
    ok &= check("stdout scan falls back to partial when nothing complete",
                d.get("partial") and d["queries"] == {"q02": 1.75})

    # 9. one-side collision, end to end via the CLI: an exact full-spelling
    #    match is recovered; a truly ambiguous compact key is excluded from
    #    BOTH the ratio table and the only-in lists (no triple-reporting)
    import subprocess
    def artifact(queries, spread=None):
        return ('{"metric":"total","value":1.0,"unit":"sec","passes":3,'
                '"spread":' + json.dumps(spread or {}) +
                ',"samples":{},"failed":[],"skipped":{},'
                '"sf":"x","queries":' + json.dumps(queries) + "}")
    def run_cli(old_q, new_q, old_spread=None, new_spread=None):
        paths = []
        for q, s in ((old_q, old_spread), (new_q, new_spread)):
            with tempfile.NamedTemporaryFile("w", suffix=".json",
                                             delete=False) as f:
                f.write(artifact(q, s))
                paths.append(f.name)
        r = subprocess.run(
            [sys.executable,
             __import__("os").path.join(
                 __import__("os").path.dirname(__file__), "benchdiff.py"),
             paths[0], paths[1]],
            capture_output=True, text=True)
        return r.stdout
    out = run_cli({"q09_a": 1.0, "q09_b": 2.0, "q10": 3.0},
                  {"q09_a": 1.1, "q10": 3.0})
    ok &= check("one-side collision recovers exact full spelling",
                "matched the other side's entry by its full spelling q09_a"
                in out and "2 shared queries" in out
                and "only in old: q09_b" in out,
                detail="" if "2 shared" in out else out)
    out = run_cli({"q09_a": 1.0, "q09_b": 2.0, "q10": 3.0},
                  {"q09": 1.1, "q10": 3.0})
    ok &= check("ambiguous one-side collision fully excluded",
                "WARNING: prefix q09 collides in old only" in out
                and "1 shared queries" in out
                and "only in" not in out,
                detail="" if "1 shared" in out else out)

    # 10. a re-keyed one-side-collision match keeps its spread entry: the
    #     2x flag on q09_a must carry the new artifact's self-reported
    #     5.5x sample disagreement (annotation + spread column), not "-"
    out = run_cli({"q09_a": 1.0, "q09_b": 2.0},
                  {"q09_a": 2.0},
                  new_spread={"q09_a": 5.5})
    ok &= check("re-keyed collision match keeps its noise annotation",
                "noisy samples" in out and "5.50" in out,
                detail="" if "noisy samples" in out else out)

    # 11. the mirror case: the spread entry sits on the COLLIDING side
    #     (whose query keys keep full spellings). The sparse spread map
    #     holds only the noisy member, so its single entry must NOT be
    #     compacted to the bare prefix — the flag on q09_a carries the
    #     OLD side's 5.5x self-reported disagreement
    out = run_cli({"q09_a": 1.0, "q09_b": 2.0},
                  {"q09_a": 2.0},
                  old_spread={"q09_a": 5.5})
    ok &= check("colliding-side spread entry keeps its full spelling",
                "noisy samples" in out and "5.50" in out,
                detail="" if "noisy samples" in out else out)

    if not ok:
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
