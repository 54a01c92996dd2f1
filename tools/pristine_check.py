"""Driver-environment mimic: run registered queries under a PRISTINE
SparkSession (no session.py tuning) against the DuckDB oracle.

The grading driver builds its own session with Spark-default configs —
default shuffle partitions, TIMESTAMP_NTZ inference ON, default
timezone handling. A query that only passes under ``get_spark()``'s
tuned configs is a latent grading failure; this harness catches the
class of bug that cost round 1 its bench numbers (NTZ inference
breaking ``unix_micros``).

Usage: python tools/pristine_check.py [--first N] [query ...]
"""

from __future__ import annotations

import argparse
import datetime as _dt
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    return str(v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=50, help="check the first N registered (0 = all)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    # deliberately NOT session.get_spark(): Spark defaults only
    spark = SparkSession.builder.appName("pristine-check").master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from watsondedupe_spark.queries import all_queries

    specs = all_queries()
    names = args.names or (list(specs)[: args.first] if args.first else list(specs))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name in names:
        spec = specs[name]
        try:
            sdf = spec.spark(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if spec.oracle is None:
                print(f"  {name:30s} ROWS-ONLY rows={len(srows)}")
                n_pass += 1
                continue
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ms = sorted(tuple(canon(r[i]) for i in so) for r in srows)
            md = sorted(tuple(canon(r[i]) for i in do) for r in drows)
            ok = sorted(scols) == sorted(dcols) and ms == md
        except Exception as ex:  # noqa: BLE001 — harness reports, never dies
            print(f"  {name:30s} ERROR {str(ex).splitlines()[0][:120]}")
            n_fail += 1
            continue
        print(f"  {name:30s} {'PASS' if ok else 'FAIL'}")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail (pristine session)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
