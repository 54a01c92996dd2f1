"""Per-query Spark JOB/STAGE counter — the scheduling-floor audit.

Runs each query once warm and reports how many Spark jobs and stages
one construct+count execution schedules (each job is ~0.1 s of pure
scheduling floor on this host, so a 0.4 s query running 4 jobs is
ALL floor). Uses job groups + statusTracker, no event-log plumbing.

Usage: python tools/profile_jobs.py NAME [NAME ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.session import get_spark

    spark = get_spark("wds-profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    specs = all_queries()

    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, schema="id long").count()
    spark.range(1024).groupBy((F.col("id") % 7).alias("k")).count().count()

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
        spec.spark(spark, args.sf).count()  # warm (substrate thresholds etc.)
        tracker = sc.statusTracker()
        group = f"jobprofile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        spec.spark(spark, args.sf).count()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        print(
            f"{name}: {dt:.3f}s jobs={len(job_ids)} stages={n_stages}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
