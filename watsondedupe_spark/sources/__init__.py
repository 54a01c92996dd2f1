"""Table readers for the driver's parquet testdata (and beyond).

The reference ingests byte streams/arrays/strings and files-via-stdin
(DedupeLibrary.cs:126-159, Cli/Program.cs:357-379); the Spark engine's
sources are DataFrame readers: ``parquet`` for the testdata tables,
``binaryFile`` for object payload ingest, ``text``/``json``/``csv``
available natively.

One real-world wrinkle handled here: pandas-written parquet stores
TIMESTAMP(NANOS), which Spark's vectorized reader refuses outright
(PARQUET_TYPE_ILLEGAL). We read such columns as nanosecond longs
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to TimestampType
with integer division — staying JVM-side, no UDF, and matching DuckDB's
truncate-to-micros semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: columns known to be nano-precision in the driver's testdata
_NANO_TS_COLS = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nano timestamps to TimestampType."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if not nano_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in nano_cols:
        if dtypes.get(c) == "bigint":
            # nanos -> micros with integer division (values ~1.7e18 exceed
            # double's 2^53 exact range, so never divide as float)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_binary_objects(spark: SparkSession, path_glob: str) -> DataFrame:
    """Ingest files as (object_key, data) via the binaryFile source —
    the Spark equivalent of the reference CLI's file ingest
    (Cli/Program.cs:357-379). object_key = file path."""
    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(F.col("path").alias("object_key"), F.col("content").alias("data"))
    )
