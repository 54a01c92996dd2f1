"""Regression gate: a bench run vs the locked BASELINE.md table.

Usage: python tools/bench_compare.py BENCH.json [--warn 1.5] [--fail 2.0]

Parses the per-query baseline table out of BASELINE.md (the round-2
locked numbers), compares each timed entry of the given bench JSON line
against its baseline entry, and reports:

- queries above the WARN ratio (default 1.5x — investigate before
  submitting, per the round-2 verdict protocol),
- queries above the FAIL ratio (default 2.0x — the standing regression
  budget), which set a non-zero exit code,
- the headline total vs the baseline headline.

Entries with no baseline row (newly added queries) are listed
informationally — they become part of the next locked table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASELINE_HEADLINE = 45.334


def load_baseline() -> dict[str, float]:
    table: dict[str, float] = {}
    in_round2 = False
    for line in open(os.path.join(REPO, "BASELINE.md")):
        if line.startswith("## Round-2 measured baseline"):
            in_round2 = True
        m = re.match(r"\| *([a-z0-9_]+) *\| *([0-9.]+) *\|", line)
        if in_round2 and m:
            table[m.group(1)] = float(m.group(2))
    return table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--warn", type=float, default=1.5)
    ap.add_argument("--fail", type=float, default=2.0)
    args = ap.parse_args()

    raw = open(args.bench_json).read()
    bench = None
    try:
        doc = json.loads(raw)
        if "metric" in doc:
            bench = doc
        elif "tail" in doc:
            # driver BENCH_r{N}.json wraps the bench line in a captured
            # "tail" string with progress-bar \r noise around it
            m = re.search(r'\{"metric".*\}', doc["tail"])
            if m:
                bench = json.loads(m.group(0))
    except json.JSONDecodeError:
        for line in raw.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                bench = json.loads(line)
    if bench is None:
        print("no bench JSON line found", file=sys.stderr)
        return 2
    if bench.get("full_record"):
        # the printed line was compacted to fit the driver's 2000-char
        # tail capture; the committed BENCH_FULL.json carries every row
        full_path = os.path.join(REPO, bench["full_record"])
        try:
            with open(full_path) as fh:
                full = json.load(fh)
            if full.get("value") == bench.get("value"):
                bench = full
            else:
                print(
                    f"note: {bench['full_record']} is from a different run "
                    "(totals differ); comparing the inlined rows only",
                    file=sys.stderr,
                )
        except OSError:
            print(f"note: {full_path} missing; comparing inlined rows only",
                  file=sys.stderr)

    baseline = load_baseline()
    times = bench.get("queries", {})

    # per-sample medians from the BENCH_DETAIL sidecar (written next to
    # BENCH_FULL by the same run): the gate keys on min-of-N, and the
    # round-7 adaptive re-sampling is one-sided (slow rows earn extra
    # runs that can only LOWER the min) — so a marginal real regression
    # that occasionally dips under jitter is systematically forgiven.
    # The median of the widened sample set is the two-sided signal: warn
    # when it stays above the lock even though the min passed.
    medians: dict[str, float] = {}
    detail_path = os.path.join(os.path.dirname(os.path.abspath(args.bench_json)),
                               "BENCH_DETAIL.json")
    if not os.path.exists(detail_path):
        detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        with open(detail_path) as fh:
            per_runs = json.load(fh).get("per_query_runs", {})
        for name, samples in per_runs.items():
            if samples:
                s = sorted(samples)
                medians[name] = s[len(s) // 2]
    except (OSError, json.JSONDecodeError):
        pass
    # contention canary (round-10): the fixed probe timed at window
    # start/mid/end by bench.py. If the canary itself moved across the
    # run, a warn row on untouched code is host contention; if the
    # canary stayed flat, the warn is a real regression to chase.
    canary = bench.get("canary") or {}
    c_mins = [min(v) for v in canary.values() if v]
    drift = (
        round(max(c_mins) / min(c_mins), 2)
        if len(c_mins) >= 2 and min(c_mins) > 0
        else None
    )
    if drift is None:
        canary_note = ""
    elif drift >= 1.3:
        canary_note = f" [canary drift {drift}x -> host contention]"
    else:
        canary_note = f" [canary flat ({drift}x) -> likely real]"
    # floor canary (round-11): the CPU canary is blind to scheduling/IO/
    # py4j-floor drift — the axis that dominates the small-batch ingest
    # rows (a round-11 interleaved A/B proved a 1.9x ingest-floor move
    # with a flat CPU canary was pure environment). When the floor probe
    # itself moved, annotate floor-bound rows with THAT evidence.
    f_canary = bench.get("floor_canary") or {}
    f_mins = [min(v) for v in f_canary.values() if v]
    floor_drift = (
        round(max(f_mins) / min(f_mins), 2)
        if len(f_mins) >= 2 and min(f_mins) > 0
        else None
    )
    FLOOR_BOUND = ("engine_ingest", "cdc_ingest", "segmented_ingest",
                   "engine_integrity_scan")

    def note_for(name: str) -> str:
        if (
            name.startswith(FLOOR_BOUND)
            and floor_drift is not None
            and floor_drift >= 1.3
        ):
            return (
                f" [floor canary drift {floor_drift}x -> host "
                "scheduling/IO contention on a fixed-floor row]"
            )
        # a flat CPU canary alone must not declare "likely real" while
        # the OTHER contention axis drifted: sub-second multi-job rows
        # carry scheduling/py4j floor too (round 12: eight median-warns
        # labeled likely-real under CPU 1.14x / floor 1.54x — the same
        # rotating set that clears on untouched code). Report both axes
        # and let min-of-runs stay the gate.
        if (
            drift is not None
            and drift < 1.3
            and floor_drift is not None
            and floor_drift >= 1.3
        ):
            return (
                f" [cpu canary flat ({drift}x) but floor canary drift "
                f"{floor_drift}x -> possibly floor contention]"
            )
        return canary_note

    warn, fail, new = [], [], []
    for name, sec in sorted(times.items()):
        base = baseline.get(name)
        if base is None:
            new.append((name, sec))
            continue
        ratio = sec / base if base else float("inf")
        if ratio >= args.fail:
            fail.append((name, sec, base, ratio))
        elif ratio >= args.warn:
            warn.append((name, sec, base, ratio))

    total = bench.get("value")
    print(f"headline: {total:.2f}s vs baseline {BASELINE_HEADLINE:.2f}s "
          f"({total / BASELINE_HEADLINE:.2f}x)")
    norm = bench.get("value_normalized")
    if norm:
        print(
            f"headline (canary-normalized): {norm:.2f}s "
            f"({norm / BASELINE_HEADLINE:.2f}x) — cross-round comparable"
        )
    # the apples-to-apples signal: entries WITH locked rows, measured sum
    # vs the sum of their locks (new unlocked entries inflate the raw
    # headline ratio without indicating any regression)
    locked_meas = sum(sec for name, sec in times.items() if name in baseline)
    locked_base = sum(base for name, base in baseline.items() if name in times)
    if locked_base:
        print(
            f"comparable subtotal ({sum(1 for n in times if n in baseline)} locked rows): "
            f"{locked_meas:.2f}s vs {locked_base:.2f}s "
            f"({locked_meas / locked_base:.2f}x)"
        )
    if drift is not None:
        print(f"canary: mins per window point {c_mins} (drift {drift}x)")
    if floor_drift is not None:
        print(f"floor canary: mins per window point {f_mins} "
              f"(drift {floor_drift}x)")
    for name, sec, base, ratio in warn:
        print(f"  WARN {name}: {sec:.3f}s vs {base:.3f}s "
              f"({ratio:.2f}x){note_for(name)}")
    # two-sided sample check: min passed its budget but the median of the
    # (possibly widened) sample set did not — informational, so a steady
    # marginal regression can't hide behind one lucky dip forever
    for name, sec in sorted(times.items()):
        base = baseline.get(name)
        med = medians.get(name)
        if base and med and sec / base < args.warn and med / base >= args.warn:
            print(f"  WARN-MEDIAN {name}: median {med:.3f}s vs lock {base:.3f}s "
                  f"({med / base:.2f}x; min {sec:.3f}s passed){note_for(name)}")
    for name, sec, base, ratio in fail:
        print(f"  FAIL {name}: {sec:.3f}s vs {base:.3f}s ({ratio:.2f}x)")
    # NEW entries (no locked row) must still be bounded: an unlocked query
    # can't regress arbitrarily while it waits to be locked into
    # BASELINE.md. Cap each at the largest locked per-query baseline (no
    # new query should dwarf every locked shape), and cap the unlocked
    # subtotal at 50% of the locked subtotal's budget.
    new_cap = max(baseline.values()) * args.fail if baseline else float("inf")
    new_bust = [(name, sec) for name, sec in new if sec > new_cap]
    new_subtotal = sum(sec for _, sec in new)
    new_subtotal_cap = (sum(baseline[n] for n in times if n in baseline) or 0) * 0.5
    for name, sec in new:
        flag = "  (OVER NEW-ENTRY CAP)" if sec > new_cap else ""
        print(f"  NEW  {name}: {sec:.3f}s (no baseline row){flag}")
    if new and new_subtotal_cap and new_subtotal > new_subtotal_cap:
        print(
            f"  FAIL unlocked subtotal {new_subtotal:.2f}s exceeds "
            f"{new_subtotal_cap:.2f}s (50% of locked subtotal)"
        )
    if not warn and not fail:
        print(f"  all {len(times)} timed entries within {args.warn}x of baseline")
    # Headline guard: the raw round-2 headline constant (57 entries) is
    # kept for continuity in the printout, but the pass/fail basis is the
    # COMPARABLE subtotal — measured sum of locked entries vs the sum of
    # their locks — because newly added timed entries inflate the raw
    # headline without indicating any regression (the per-entry 2x budget
    # above still catches any individual blow-up).
    subtotal_bust = bool(locked_base) and locked_meas > locked_base * 2
    new_subtotal_bust = bool(new) and bool(new_subtotal_cap) and new_subtotal > new_subtotal_cap
    return 1 if fail or subtotal_bust or new_bust or new_subtotal_bust else 0


if __name__ == "__main__":
    raise SystemExit(main())
