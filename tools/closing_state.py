#!/usr/bin/env python3
"""Generate CLOSING.md — the ONE authoritative closing-state block — from
the repo's own artifacts (round-9 verdict next #6: the query/test/bench
numbers appeared in README, PLANS, BASELINE and SURVEY annotations, four
places to desync; rounds 8 and 9 each shipped a count mismatch at some
point). README/PLANS/BASELINE now LINK here instead of restating numbers.

Inputs (all derived, nothing hand-typed):
  - SparkEntry.scala          -> registered query count, oracle count
  - bench_runs/benchrN*_*.json (highest round N) -> series totals,
    best-of-series sum, failed/flaky/skipped
  - an `sbt test` log passed via --test-log (optional) -> test/suite counts

Usage: python3 tools/closing_state.py [--test-log /tmp/sbt_test.log]
Writes CLOSING.md in the repo root. Re-run after any registry change,
bench refresh, or test-count change; commit the result.
"""
import argparse, json, os, re, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def section_keys(src, header):
    """Query keys in the map literal that starts at `header`."""
    i = src.index(header)
    # the map literal ends at the next 'def ' at top-level indent after it
    j = src.find("\n  def ", i + 1)
    body = src[i:j if j > 0 else len(src)]
    return set(re.findall(r'"(q_[a-zA-Z0-9_]+)" ->', body))


def lint_plans_pinned():
    """PLANS.md ↔ test-suite drift lint (round-13 verdict #7): every PLANS.md
    table row claiming a pinned/asserted shape must be traceable to real
    enforcement — either a query name that appears in some test source, or a
    named <X>Spec/<X>Main file that exists. A narrative claim with neither is
    exactly the drift this guards against."""
    import glob
    tests = ""
    for f in glob.glob(os.path.join(ROOT, "src/test/scala/graft/*.scala")):
        tests += open(f).read()
    bad = []
    for ln in open(os.path.join(ROOT, "PLANS.md")):
        if not ln.startswith("| `") or not re.search(r"pinn?ed|asserted", ln, re.I):
            continue
        qs = re.findall(r"`(q_[a-zA-Z0-9_]+)`", ln.split("|")[1])
        specs = re.findall(r"\b([A-Z][A-Za-z0-9]*(?:Spec|Main))\b", ln)
        # boundary-guarded containment: `q_funnel` must not satisfy itself
        # via `q_funnel_ordered` appearing in a test (review catch — the
        # registry has 12 such prefix pairs)
        ok = any(re.search(re.escape(q) + r"(?![a-zA-Z0-9_])", tests)
                 for q in qs) or any(
            os.path.exists(os.path.join(ROOT, f"src/test/scala/graft/{x}.scala"))
            for x in specs)
        if not ok:
            bad.append(ln[:100])
    if bad:
        sys.exit("PLANS.md pinned-claim rows with no traceable test "
                 "(name the enforcing Spec or cover the query in a test):\n"
                 + "\n".join(bad))


def parse_durations(log):
    """(total seconds, {suite: seconds}) of NAMED-test durations from a
    ScalaTest -oD log. ScalaTest's sbt runner prints each suite's output as
    one atomic group (suite header line, then its `- name (duration)`
    bullets), so attribution is a running current-suite header. Mirrors
    TestDurations.parse in SuiteBudgetSpec (the Scala copy exists for the
    in-suite red-path unit test; keep the regexes and factors in sync)."""
    total = 0.0
    per = {}
    suite = None
    hdr = re.compile(r"^(?:\[info\]\s*)?([A-Z][A-Za-z0-9]*(?:Spec|Suite)):\s*$")
    # a test line is a `- name (durations)` bullet, with or without sbt's
    # `[info] ` logger prefix; suite headers, `+ info()` output and sbt's
    # own timing lines have no dash bullet and must not count
    pat = re.compile(r"^(?:\[info\]\s*)?- .*\(((?:\d+ (?:hour|minute|second"
                     r"|millisecond)s?(?:, )?)+)\)\s*$")
    unit_s = {"hour": 3600.0, "minute": 60.0, "second": 1.0,
              "millisecond": 0.001}
    for ln in log.splitlines():
        h = hdr.match(ln)
        if h:
            suite = h.group(1)
            continue
        m = pat.match(ln)
        if not m:
            continue
        d = sum(int(n) * unit_s[u] for n, u in
                re.findall(r"(\d+) (hour|minute|second|millisecond)s?",
                           m.group(1)))
        total += d
        if suite:
            per[suite] = per.get(suite, 0.0) + d
    return total, per


DURATIONS_LEDGER = os.path.join(ROOT, "test_durations.txt")
# Keep in sync with TestDurations in SuiteBudgetSpec.scala.
# WHY SHARES, NOT THE TOTAL (round-18 measurement): per-test durations are
# wall measurements per test, so the whole profile scales with the host
# window exactly like the suite wall — same code measured 17m24s committed vs
# 31m14s in this round's slow window (1.8x) with a FLAT per-suite share
# profile. A >1.25x total rule would red on every slow window and ratchet the
# baseline up with forced appends. A suite's SHARE of the total cancels the
# window multiplier: a new heavy spec or a regressing suite moves its share,
# uniform host slowness moves nothing.
SHARE_FACTOR = 1.5    # a suite's share may grow to 1.5x its baseline share
SHARE_PP = 1.5        # ...plus 1.5 percentage points (admits new small suites)
TOTAL_BACKSTOP = 2.5  # total still reds beyond any observed window spread


def lint_durations(log, accept_tag):
    """Measured-durations lint (round-18 verdict #1, the salt-ledger pattern
    applied to suite cost): every closing regen parses the ACTUAL test log —
    the committed-wall lint reads a self-reported number a regression can
    hide behind until a slow number is chosen for commit. Red when any
    suite's share of the duration sum grows past SHARE_FACTOR x baseline +
    SHARE_PP (window-insensitive), or the total grows past TOTAL_BACKSTOP x
    (runaway growth no window explains). Accepting a new profile is a
    deliberate `--accept-durations <tag>` block append, never silent."""
    total, per = parse_durations(log)
    if total <= 0 or not per:
        sys.exit("--test-log has no -oD per-test durations — run sbt test "
                 "with the build.sbt default options")
    blocks = []  # (tag, total, {suite: seconds})
    for ln in open(DURATIONS_LEDGER):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        if ln.startswith("@ "):
            _, tag, tot = ln.split()
            blocks.append((tag, float(tot), {}))
        else:
            suite, val = ln.split()
            blocks[-1][2][suite] = float(val)
    if accept_tag:
        if any(t == accept_tag for t, _, _ in blocks):
            sys.exit(f"--accept-durations tag '{accept_tag}' already in the "
                     "ledger — tags are unique")
        with open(DURATIONS_LEDGER, "a") as f:
            f.write(f"@ {accept_tag} {total:.1f}\n")
            for s, v in sorted(per.items()):
                f.write(f"{s} {v:.1f}\n")
        blocks.append((accept_tag, total, dict(per)))
        print(f"durations ledger: appended block {accept_tag} ({total:.1f}s, "
              f"{len(per)} suites)")
    if not blocks:
        sys.exit("test_durations.txt has no blocks — seed the baseline with "
                 "--accept-durations <tag>")
    tag0, tot0, per0 = blocks[-1]
    offenders = []
    for s, v in per.items():
        share = v / total
        base = per0.get(s, 0.0) / tot0
        if share > base * SHARE_FACTOR + SHARE_PP / 100.0:
            offenders.append(f"{s}: share {share * 100:.1f}% vs baseline "
                             f"{base * 100:.1f}% ({tag0})")
    if total > tot0 * TOTAL_BACKSTOP:
        offenders.append(f"TOTAL {total:.0f}s > {TOTAL_BACKSTOP}x baseline "
                         f"{tot0:.0f}s ({tag0}) — beyond any window spread")
    if offenders:
        sys.exit(
            "measured test-duration profile regressed vs the committed "
            "ledger (test_durations.txt):\n  " + "\n  ".join(offenders) +
            "\nEither fix the regression or accept deliberately: re-run "
            "with --accept-durations <new-tag> (appends a new block).")
    return total, tot0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-log", help="path to an `sbt test` output log")
    ap.add_argument("--volume-log", help="path to the once-per-round "
                    "GRAFT_VOLUME=1 testOnly graft.VolumeTruthSpec log")
    ap.add_argument("--accept-durations", metavar="TAG",
                    help="deliberately accept >25%% duration-sum growth by "
                    "appending '<TAG> <measured>' to test_durations.txt")
    args = ap.parse_args()

    lint_plans_pinned()

    entry = open(os.path.join(ROOT, "src/main/scala/graft/SparkEntry.scala")).read()
    queries = section_keys(entry, "def queries")
    oracles = section_keys(entry, "def oracleSql")
    missing_oracle = sorted(queries - oracles)

    bdir = os.path.join(ROOT, "bench_runs")
    series_files = [f for f in os.listdir(bdir)
                    if re.match(r"benchr\d+[a-z]?_\d\.json$", f)]
    # latest series = highest round number, then latest letter suffix
    def series_key(f):
        m = re.match(r"benchr(\d+)([a-z]?)_", f)
        return (int(m.group(1)), m.group(2))
    top = max(series_key(f) for f in series_files)
    latest = sorted(f for f in series_files if series_key(f) == top)
    series_name = f"benchr{top[0]}{top[1]}"
    totals, best, bad = [], {}, {"failed": set(), "flaky": set(), "skipped": set()}
    for f in latest:
        d = json.load(open(os.path.join(bdir, f)))
        totals.append((f, round(d["value"], 1)))
        for k in bad:
            bad[k] |= set(d.get(k, []))
        # cross-check (round-11 ADVICE): the regex-parsed registry count must
        # match the artifact's per-query map exactly — a drifted section_keys
        # parse (or a stale series committed after a registry change) would
        # otherwise ship a silently wrong headline count
        artifact_qs = set(d["queries"])
        if artifact_qs != queries:
            extra = sorted(artifact_qs - queries)
            gone = sorted(queries - artifact_qs)
            sys.exit(
                f"{f}: bench artifact queries ({len(artifact_qs)}) != parsed "
                f"registry ({len(queries)}) — refresh the bench series or fix "
                f"section_keys. artifact-only: {extra[:5]} registry-only: {gone[:5]}")
        for q, v in d["queries"].items():
            if v >= 0:
                best[q] = min(best.get(q, float("inf")), v)
    best_sum = round(sum(best.values()), 1)

    # staged list of the latest series (identical across runs of a series —
    # it names the queries whose Spark timing is a memoized read)
    staged = set()
    for f in latest:
        staged |= set(json.load(open(os.path.join(bdir, f))).get("staged", []))
    nonstaged_sum = round(sum(v for q, v in best.items() if q not in staged), 1)

    # Cross-engine column (round-13: derived here so BASELINE's narrative
    # can't desync from the numbers): latest duckdb_oracle_sf01_r*.json,
    # cross-checked against the registry. The staged-fair Spark side is
    # recomputed from THIS series' best-of (not the pass-1 snapshot pinned
    # inside the duckdb artifact at generation time).
    duck_lines = []
    ducks = [f for f in os.listdir(bdir)
             if re.match(r"duckdb_oracle_sf01_r\d+[a-z_]*\.json$", f)]
    if ducks:
        # key on (round int, FULL suffix string) like the benchrN selection
        # above (round-13 ADVICE: keying on the int alone let _r13 vs _r13b
        # tie and follow unordered os.listdir order; a single-letter capture
        # still tied _r15 vs _r15_fuzz and r15ab vs r15a — review catch).
        # The suffix string totally orders every name the listing admits.
        def duck_key(f):
            m = re.search(r"_r(\d+)([a-z_]*)\.json$", f)
            return (int(m.group(1)), m.group(2))
        dfile = max(ducks, key=duck_key)
        duck = json.load(open(os.path.join(bdir, dfile)))
        # Both ratios must sum the SAME key set on both sides (round-13
        # ADVICE: a query negative in every Spark run — likelier now via the
        # abandoned-drain skip — would shrink best/nonstaged_sum while the
        # DuckDB sums kept the full registry, skewing both ratios silently).
        skipped_everywhere = sorted(queries - set(best))
        if skipped_everywhere:
            duck_lines = [f"- **Cross-engine:** SUPPRESSED — no valid Spark "
                          f"time in any run of {series_name} for: "
                          f"{', '.join(skipped_everywhere)}"]
        elif set(duck["queries"]) == queries and not duck.get("errors"):
            dtot = round(sum(duck["queries"].values()), 1)
            drecomp = round(sum(v for q, v in duck["queries"].items()
                                if q not in staged), 1)
            duck_lines = [
                f"- **Cross-engine ({dfile}):** DuckDB {dtot} s vs Spark "
                f"best-of {best_sum} s — ratio {best_sum / dtot:.2f}",
                f"- **Staged-fair (the {len(queries) - len(staged)} queries "
                f"both engines recompute):** DuckDB {drecomp} s vs Spark "
                f"{nonstaged_sum} s — ratio {nonstaged_sum / drecomp:.2f}",
            ]

    tests = suites = wall = None
    dur_measured = dur_baseline = None
    if args.test_log:
        log = open(args.test_log).read()
        dur_measured, dur_baseline = lint_durations(log, args.accept_durations)
        m = re.search(r"Total number of tests run: (\d+)", log)
        s = re.search(r"Suites: completed (\d+), aborted (\d+)", log)
        ok = re.search(r"Tests: succeeded (\d+), failed (\d+)", log)
        if m and s and ok:
            tests, suites = int(m.group(1)), int(s.group(1))
            if int(s.group(2)) or int(ok.group(2)) or int(ok.group(1)) != tests:
                sys.exit("test log shows failures/aborts — not a closing state")
        # suite wall (round-12 verdict #5): "Run completed in 19 minutes,
        # 14 seconds." — recorded here so SuiteBudgetSpec can lint it (the
        # suite outgrowing a driver session the way the bench once did)
        w = re.search(r"Run completed in (?:(\d+) minutes?, )?(\d+) seconds?", log)
        if w:
            wall = int(w.group(1) or 0) * 60 + int(w.group(2))

    # Once-per-round volume truths (round-14: tagged out of the default
    # suite; this line is the no-silent-caps record that they still ran).
    # A closing regen (--test-log present) REQUIRES the volume log — an
    # optional flag would let a regen silently erase the only evidence the
    # excluded tests ran (review catch, round 14).
    vol_line = None
    if args.test_log and not args.volume_log:
        sys.exit("--test-log without --volume-log: a closing state must "
                 "record the GRAFT_VOLUME=1 run (the volume truths are "
                 "excluded from the default suite — without this line "
                 "nothing proves they ran this round)")
    if args.volume_log:
        vlog = open(args.volume_log).read()
        vok = re.search(r"Tests: succeeded (\d+), failed (\d+)", vlog)
        vw = re.search(r"Run completed in (?:(\d+) minutes?, )?(\d+) seconds?", vlog)
        if not vok or int(vok.group(2)) or int(vok.group(1)) < 2:
            sys.exit("volume log missing/failed — not a closing state")
        if not vw:
            sys.exit("volume log has no 'Run completed in' line — truncated?")
        vwall = int(vw.group(1) or 0) * 60 + int(vw.group(2))
        vol_line = (f"- **Volume truths (GRAFT_VOLUME=1, run separately):** "
                    f"{vok.group(1)} green in {vwall // 60}m{vwall % 60:02d}s")

    lines = [
        "# Closing state (generated — do not hand-edit)",
        "",
        f"Generated by `tools/closing_state.py` on "
        f"{datetime.date.today().isoformat()}. README/PLANS/BASELINE link",
        "here; this file is the only place these numbers live.",
        "",
        f"- **Registered queries:** {len(queries)}",
        f"- **Oracled queries:** {len(oracles)}"
        + (f" (rows-only: {', '.join(missing_oracle)})" if missing_oracle else
           " (every query oracled)"),
    ]
    if tests is not None:
        lines.append(f"- **ScalaTest:** {tests} green across {suites} suites")
    if vol_line:
        lines.append(vol_line)
    if wall is not None:
        lines.append(f"- **Suite wall:** {wall // 60}m{wall % 60:02d}s "
                     "(SuiteBudgetSpec lints this against its ceiling)")
    if dur_measured is not None:
        lines.append(
            f"- **Measured test-duration sum (-oD):** {dur_measured:.1f}s vs "
            f"ledger baseline {dur_baseline:.1f}s — per-suite SHARE lint "
            f"(window-insensitive) + {TOTAL_BACKSTOP}x total backstop, both "
            f"green (test_durations.txt)")
    lines += [
        f"- **Bench series ({series_name}):** "
        + ", ".join(f"{t} s" for _, t in totals)
        + f" — best-of-series sum {best_sum} s over {len(best)} queries",
        f"- **Bench health:** failed={sorted(bad['failed'])} "
        f"flaky={sorted(bad['flaky'])} skipped={sorted(bad['skipped'])}",
        *duck_lines,
        "",
        "Regenerate: `python3 tools/closing_state.py --test-log <sbt-test.log> "
        "--volume-log <volume-testOnly.log>`",
    ]
    out = os.path.join(ROOT, "CLOSING.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
