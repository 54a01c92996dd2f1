"""Z-order clustered writes: Morton-code correctness and the data-
skipping property (per-file bounding boxes shrink vs a naive layout)."""

import math

from pyspark.sql import functions as F

from watsondedupe_spark.sinks.zorder import quantize, write_zordered, zvalue


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011, y=0b101 -> interleave(y,x from bit 0): bits x0,y0,x1,y1,x2,y2
    # = 1,1, 1,0, 0,1 -> 0b100111 = 39
    (z,) = df.select(zvalue(["x", "y"], bits=3)).first()
    assert z == 0b100111


def test_quantize_clamps_to_grid(spark):
    df = spark.createDataFrame([(-1.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double")
    vals = [r[0] for r in df.select(quantize("v", 0.0, 100.0, 4)).collect()]
    assert vals[0] == 0 and vals[1] == 0 and vals[3] == 15 and vals[4] == 15
    assert 0 < vals[2] < 15


def _file_bbox_mean_area(spark, path):
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    boxes = (
        df.groupBy("_f")
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"))
        .select(((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))).alias("a"))
        .collect()
    )
    return sum(r.a for r in boxes) / len(boxes), len(boxes)


def test_zorder_write_shrinks_file_bboxes(spark, tmp_path):
    # 1024x1024 grid sampled uniformly; 16 files
    pts = (
        spark.range(0, 40000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1024)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).alias("y"),
        )
    )
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zord")
    pts.repartition(16).write.mode("overwrite").parquet(naive)
    write_zordered(pts, zord, ["x", "y"], bits=10, n_files=16)

    naive_area, n1 = _file_bbox_mean_area(spark, naive)
    z_area, n2 = _file_bbox_mean_area(spark, zord)
    assert n2 >= 8  # the range partitioner actually spread the curve
    # naive files span ~the whole domain; z-order files cover tight tiles
    assert z_area < naive_area / 4, (z_area, naive_area)
    # round-trip: same multiset of points
    assert spark.read.parquet(zord).count() == 40000
