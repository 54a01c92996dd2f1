"""Registry-wide no-corpus-broadcast sweep (round 8).

Runs every registered query (or a named subset), executes it so AQE
finalizes the plan (runtime broadcast conversion is the bug class —
round 7's 100x deep tier caught three sites that only converted at
runtime), then walks every BroadcastExchange subtree via
``plans.broadcast_audit`` and reports any broadcast side whose
cardinality grows with the corpus.

Usage:
    python tools/broadcast_audit.py [name ...] [--sf DIR] [--json OUT]

Exit code 1 when any violation is found. Violations mean one of:
  - a join needs a ``shuffle_hash`` pin (the round-7 pattern:
    curation_ext.py:138, llm_pipeline.py:418, retrieval_ext.py:1297), or
  - the audit's bounded-keys/bounded-tables whitelists are missing a
    genuinely bounded side (centroids, codebooks, thresholds, spines) —
    extend them WITH the boundedness argument in the commit message.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.001"
    json_out = None
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    strict = "--strict" in args
    if strict:
        args.remove("--strict")
    names = args

    from watsondedupe_spark import plans as P
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.session import get_spark

    spark = get_spark("broadcast-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    if names:
        specs = {n: specs[n] for n in names}

    report: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    n_bex = n_sp = 0
    for name, spec in specs.items():
        t0 = time.time()
        try:
            df = spec.spark(spark, sf_dir)
            df.collect()
            audit = P.broadcast_audit(df)
            sp_audit = P.single_partition_audit(df)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name:42s} ERROR {errors[name][:80]}", flush=True)
            continue
        n_bex += len(audit)
        n_sp += len(sp_audit)
        from watsondedupe_spark.plans import (
            BROADCAST_AUDIT_ALLOW,
            filter_allowed_violations,
        )

        # round 9: exceptions are (reason-pattern, count)-scoped, never
        # blanket per-query — a new unrelated violation in an
        # allowlisted query still fails the sweep
        bad = filter_allowed_violations(
            name,
            [r for r in audit if not r["ok"] or (strict and r.get("anchored"))],
            BROADCAST_AUDIT_ALLOW,
        ) + [
            {**r, "kind": "single_partition"}
            for r in filter_allowed_violations(
                name, [r for r in sp_audit if not r["ok"]], SP_AUDIT_ALLOW
            )
        ]
        if bad:
            report[name] = bad
            print(f"{name:42s} VIOLATION x{len(bad)} ({time.time()-t0:.1f}s)",
                  flush=True)
            for r in bad:
                kind = "SP" if r.get("kind") == "single_partition" else "bcast"
                print(f"    [{kind}] node {r['node_id']}: {r['reason']}")
        else:
            print(
                f"{name:42s} ok ({len(audit)} bcast, {len(sp_audit)} sp, "
                f"{time.time()-t0:.1f}s)",
                flush=True,
            )

    print(f"\n{len(specs) - len(errors)} audited, {n_bex} broadcast sides, "
          f"{n_sp} single-partition funnels, "
          f"{len(report)} queries with violations, {len(errors)} errors")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {"violations": report, "errors": errors,
                 "audited": len(specs) - len(errors),
                 "broadcast_sides": n_bex,
                 "single_partition_funnels": n_sp, "sf_dir": sf_dir},
                fh, indent=1, sort_keys=True,
            )
    spark.stop()
    return 1 if report else 0


# Documented funnel exceptions (same structured contract as
# BROADCAST_AUDIT_ALLOW: a boundedness argument + reason pattern + max
# count). Populated by the sweep triage; empty means every funnel
# classifies cleanly.
SP_AUDIT_ALLOW: dict[str, dict] = {}


if __name__ == "__main__":
    raise SystemExit(main())
