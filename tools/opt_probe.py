"""Round-12 optimization probe: per-query timing + formatted-plan dump.

Usage:
  python tools/opt_probe.py NAME [NAME ...] [--plan-dir plans/r12 --tag before]
          [--steady N] [--sf /root/testdata/sf0.1] [--no-warm-substrates]

Mirrors bench.py's methodology exactly (cold run + N steady .count()
runs, min reported, substrates pre-warmed) so numbers here are directly
comparable to BENCH_FULL.json rows. With --plan-dir, each query's
``explain('formatted')`` lands in ``<plan-dir>/<name>_<tag>.txt``.

Plan capture note: explain() is taken on a freshly built DataFrame
BEFORE the timed runs, so builder-internal actions (substrate builds,
collect()-based thresholds) run once and the captured plan is the
steady-state one.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--steady", type=int, default=2)
    ap.add_argument("--no-warm-substrates", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.session import get_spark

    spark = get_spark("wds-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # identical warmup to bench.py main()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, schema="id long").count()
    spark.range(1024).groupBy((F.col("id") % 7).alias("k")).count().count()

    if not args.no_warm_substrates:
        import watsondedupe_spark.queries.curation_ext as _cur
        import watsondedupe_spark.queries.engine_native as _en
        import watsondedupe_spark.queries.llm_pipeline as _llm

        _en._simhash_fp(spark, args.sf)
        _llm.minhash_sig_df(spark, args.sf).count()
        _llm.jaccard_pair_stats_df(spark, args.sf).count()
        _cur._ann_index(spark, args.sf)[3].count()

    for name in args.names:
        spec = specs.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"opt_probe: {name}")
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = spec.spark(spark, args.sf)
            buf = io.StringIO()
            stdout = sys.stdout
            try:
                sys.stdout = buf
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(os.path.join(args.plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        t0 = time.time()
        n = spec.spark(spark, args.sf).count()
        cold = time.time() - t0
        steady = []
        for _ in range(args.steady):
            t0 = time.time()
            assert spec.spark(spark, args.sf).count() == n
            steady.append(round(time.time() - t0, 3))
        print(
            f"{name}: cold={cold:.3f} steady={steady} min={min(steady):.3f} rows={n}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
