"""Phase decomposition + plan capture for engine_integrity_scan.

Replays the query body phase by phase (ingest / before-counts+victim /
plants / after-counts / repair / healed-counts) with wall-clock timers,
and optionally dumps verify()'s formatted plan (the full scan over the
freshly-built store) for the plan-evidence files.

Usage: python tools/profile_integrity.py [--reps N] [--plan-out FILE]
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    plan_out = (
        sys.argv[sys.argv.index("--plan-out") + 1] if "--plan-out" in sys.argv else None
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from watsondedupe_spark.session import get_spark

    spark = get_spark("wds-profile-integrity")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # same warmup as bench.py main()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, schema="id long").count()
    spark.range(1024).groupBy((F.col("id") % 7).alias("k")).count().count()

    from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE
    from watsondedupe_spark.engine import DedupeEngine
    from watsondedupe_spark.keys import chunk_key
    from watsondedupe_spark.queries.engine_native import _VERIFY_CHECKS, _docs

    objs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("object_key"),
        F.encode(F.repeat("text", 20), "UTF-8").alias("data"),
    )

    for rep in range(reps):
        root = tempfile.mkdtemp(prefix="prof_integrity_")
        phases: list[tuple[str, float]] = []

        def timed(tag, fn):
            sc.setJobDescription(f"integrity:{tag}")
            t0 = time.time()
            out = fn()
            phases.append((tag, time.time() - t0))
            return out

        try:
            eng = DedupeEngine.create(
                spark, os.path.join(root, "idx"), ChunkSettings(*SMALL_FILE_PROFILE)
            )
            timed("ingest", lambda: eng.write_batch(objs))

            def counts():
                got = {
                    r.check: r.n
                    for r in eng.verify()
                    .groupBy("check")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
                return {c: int(got.get(c, 0)) for c in _VERIFY_CHECKS}

            if plan_out and rep == 0:
                buf = io.StringIO()
                stdout = sys.stdout
                try:
                    sys.stdout = buf
                    eng.verify().explain("formatted")
                finally:
                    sys.stdout = stdout
                with open(plan_out, "w") as fh:
                    fh.write(buf.getvalue())

            timed("before+victim", lambda: counts())
            victim = timed(
                "victim", lambda: eng.chunks.agg(F.min("chunk_key")).collect()[0][0]
            )
            orphan = b"___orphan_payload"

            def plants():
                eng.store.append(
                    "chunk_store",
                    spark.createDataFrame(
                        [
                            (victim, bytearray(b"x")),
                            (chunk_key(orphan), bytearray(orphan)),
                        ],
                        "chunk_key string, data binary",
                    ),
                )
                eng.store.append(
                    "object_map",
                    spark.createDataFrame(
                        [("___ghost", victim, 1, 0, 0)],
                        "object_key string, chunk_key string, length int, "
                        "position int, address long",
                    ),
                )

            timed("plants", plants)
            timed("after", counts)
            timed("repair", eng.repair)
            timed("healed", counts)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        total = sum(s for _, s in phases)
        print(
            f"rep{rep}: total {total:.2f}s | "
            + " ".join(f"{t}={s:.2f}" for t, s in phases),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
