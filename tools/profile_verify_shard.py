"""Floor decomposition for the engine_verify_shard scale row.

Builds bench_engine_dr's exact substrate (ingest + 8MB-target optimize)
at the given staged dir, then times: full verify, the (0,4) shard, and
a (0,64) sliver shard — the sliver's wall-clock IS the scan's fixed
floor f (its payload IO is ~1/64), so the expected gated fraction is
(0.25*(F-f)+f)/F and the lever (floor vs IO) becomes visible.

Usage: python tools/profile_verify_shard.py [SF_DIR] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wds_scale100x_532e9bb3"
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE
    from watsondedupe_spark.engine import DedupeEngine
    from watsondedupe_spark.session import get_spark

    spark = get_spark("wds-profile-vshard")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    objs = docs.select(
        F.col("doc_id").cast("string").alias("object_key"),
        F.encode(F.repeat("text", 20), "UTF-8").alias("data"),
    )
    root = tempfile.mkdtemp(prefix="prof_vshard_")
    try:
        eng = DedupeEngine.create(
            spark, os.path.join(root, "idx"), ChunkSettings(*SMALL_FILE_PROFILE)
        )
        t0 = time.time()
        eng.write_batch(objs)
        print(f"ingest {time.time()-t0:.1f}s")
        eng.OPTIMIZE_TARGET_FILE_BYTES = 8 << 20
        t0 = time.time()
        eng.optimize()
        print(f"optimize {time.time()-t0:.1f}s")

        def timed(tag, fn):
            sc.setJobDescription(tag)
            t0 = time.time()
            df = fn()  # includes the eager checkpoint job
            t1 = time.time()
            n = df.count()  # branches + union
            sec = time.time() - t0
            sc.setJobDescription(None)
            print(f"  {tag:14s} {sec:6.2f}s  (build+ckpt {t1-t0:5.2f} / "
                  f"count {sec-(t1-t0):5.2f})  viol={n}")
            return sec

        for rep in range(reps):
            print(f"-- rep {rep}")
            F_ = timed("full", lambda: eng.verify())
            s4 = timed("shard1of4", lambda: eng.verify(shards=(0, 4)))
            s64 = timed("shard1of64", lambda: eng.verify(shards=(0, 64)))
            pred = (0.25 * (F_ - s64) + s64) / F_
            print(f"  frac(0,4)={s4/F_:.3f}  floor~{s64:.2f}  "
                  f"pred_frac_at_floor={pred:.3f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
