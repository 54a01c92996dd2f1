"""Stage-level profile of chunk_objects_segmented at two scale points.

Round-9 verdict item #1: segmented_ingest throughput decays 107.4 MB/s
@x30 -> 63.5 MB/s @x100 (SCALE_r08.json) — the only measured
superlinear trend at HEAD. This script isolates WHERE the extra
per-byte cost appears by timing three nested plan prefixes at each
object count (same 16 MB objects / 4 MB frames as the scale gate):

  frames  — parquet read + offset explode + substring + the
            repartition shuffle (forced with sum(length(frame_data)))
  cdc     — frames + the Arrow CDC kernel, NO persist and NO
            position-restore join (sum(length(chunk_data)))
  full    — the shipped operator (persist + count-prefix window +
            join-back), exactly what the scale gate times

Usage: python tools/profile_segmented.py [n_small] [n_big]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_payloads(spark, sf_dir: str, n_objects: int, target_mb: int = 16):
    import hashlib
    import tempfile

    from pyspark.sql import functions as F

    target = target_mb << 20
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{n_objects}:{target_mb}:v2".encode()
    ).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"wds_segbench_{tag}")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        (
            docs.filter(F.col("n_chars") > 0)
            .limit(n_objects)
            .select(
                F.col("doc_id").cast("string").alias("object_key"),
                F.encode(
                    F.expr(f"repeat(text, CAST({target} / n_chars AS INT))"), "UTF-8"
                ).alias("data"),
            )
            .repartition(n_objects)
            .write.mode("overwrite")
            .parquet(stage)
        )
    return stage


def profile_point(spark, stage_dir: str, segment_mb: int = 4) -> dict:
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import (
        ChunkSettings,
        SMALL_FILE_PROFILE,
        chunk_objects_segmented,
    )

    settings = ChunkSettings(*SMALL_FILE_PROFILE)
    seg = segment_mb << 20
    objs = spark.read.parquet(stage_dir)
    mb = (objs.agg(F.sum(F.length("data"))).collect()[0][0] or 0) / 1e6

    out: dict = {"mb": round(mb, 1)}

    # --- frames prefix: explode + substring + repartition shuffle ---
    full = chunk_objects_segmented(objs, settings, segment_size=seg)
    full._cdc_cache.unpersist()  # undo the ctor persist; rebuild below
    n_frames = (F.length("data") + seg - 1).cast("long") / F.lit(seg)
    frames = (
        objs.select("object_key", "data")
        .select(
            "object_key",
            "data",
            F.explode(F.sequence(F.lit(0), n_frames.cast("long") - 1)).alias(
                "frame_idx"
            ),
        )
        .select(
            "object_key",
            "frame_idx",
            F.substring(
                F.col("data"), (F.col("frame_idx") * seg + 1).cast("int"), seg
            ).alias("frame_data"),
        )
    )
    frames = frames.repartition(
        spark.sparkContext.defaultParallelism, "object_key", "frame_idx"
    )
    t0 = time.time()
    frames.agg(F.sum(F.length("frame_data"))).collect()
    out["frames_sec"] = round(time.time() - t0, 2)

    # --- cdc prefix: + Arrow kernel, no persist, no position join ---
    raw = chunk_objects_segmented(objs, settings, segment_size=seg)
    cache = raw._cdc_cache
    cache.unpersist()
    t0 = time.time()
    cache.agg(F.sum(F.length("chunk_data"))).collect()
    out["cdc_sec"] = round(time.time() - t0, 2)
    spark.catalog.clearCache()

    # --- full operator, as the scale gate times it ---
    t0 = time.time()
    chunks = chunk_objects_segmented(objs, settings, segment_size=seg)
    n = chunks.count()
    out["full_sec"] = round(time.time() - t0, 2)
    out["n_chunks"] = n
    chunks._cdc_cache.unpersist()
    out["mbps_full"] = round(mb / out["full_sec"], 1)
    out["join_overhead_sec"] = round(out["full_sec"] - out["cdc_sec"], 2)
    return out


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from watsondedupe_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "wds-profile-segmented",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "spark.driver.maxResultSize": "4g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import json

    results = {}
    # warm codegen/Arrow once on a tiny run
    warm = stage_payloads(spark, sf01, 2)
    profile_point(spark, warm)
    for n in (n_small, n_big):
        stage = stage_payloads(spark, sf01, n)
        results[f"n{n}"] = profile_point(spark, stage)
        print(json.dumps({f"n{n}": results[f"n{n}"]}), flush=True)
    a, b = results[f"n{n_small}"], results[f"n{n_big}"]
    scale = b["mb"] / a["mb"]
    print(
        json.dumps(
            {
                "bytes_ratio": round(scale, 2),
                "frames_ratio": round(b["frames_sec"] / a["frames_sec"], 2),
                "cdc_ratio": round(b["cdc_sec"] / a["cdc_sec"], 2),
                "full_ratio": round(b["full_sec"] / a["full_sec"], 2),
                "join_overhead": [a["join_overhead_sec"], b["join_overhead_sec"]],
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
