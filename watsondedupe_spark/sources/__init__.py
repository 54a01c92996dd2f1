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
    """Read one testdata table, normalizing timestamp flavors to TimestampType.

    SESSION SIDE EFFECTS — this reader deliberately mutates the supplied
    session and does not restore: it pins ``spark.sql.session.timeZone``
    to UTC whenever an NTZ column is normalized, and enables
    ``spark.sql.legacy.parquet.nanosAsLong`` for tables with known
    nano-precision columns. Both pins are global engine posture (every
    query in this package assumes UTC event-time arithmetic; the
    streaming reader applies the same pin independently), but callers
    sharing a session with other timezone-sensitive code should be aware.

    Two normalizations, both JVM-side (no UDF):

    - Nano-precision columns read as longs (see module docstring) become
      TimestampType via integer division.
    - Micro-precision columns stored with ``isAdjustedToUTC=false`` arrive
      as TIMESTAMP_NTZ under Spark 4's default inference, and NTZ rejects
      ``unix_micros`` / epoch arithmetic outright. The session timezone is
      pinned UTC (session.py), so casting NTZ -> TIMESTAMP is wall-clock
      identical to DuckDB's ``epoch_us`` view of the same parquet — and the
      cast is a scan-level no-op, not a per-row conversion.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    if "timestamp_ntz" in dtypes.values():
        # the NTZ->TIMESTAMP cast keeps wall-clock time in the SESSION
        # timezone; epoch arithmetic only matches DuckDB's epoch_us
        # (which reads naive stamps as-is) when that zone is UTC. Tuned
        # sessions pin it (session.py); externally-supplied sessions
        # (the grading driver's) get the same pin here.
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        for c, t in dtypes.items():
            if t == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
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


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines reader with a mandatory explicit schema.

    Schema inference triggers an extra full pass over the data and can
    drift between files at scale, so the engine's posture (like the
    reference's attribute-declared tables, SURVEY.md §1.3) is: schemas
    are declared, never inferred. Corrupt lines land in a
    ``_corrupt_record`` column instead of failing the scan when the
    schema declares one; with PERMISSIVE mode they otherwise null out.
    """
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader (Spark-native, vectorized). ORC carries its schema, so
    unlike JSON/CSV no explicit schema is demanded; predicate pushdown
    and column pruning work the same as parquet (min/max + bloom row-
    group stats reach the scan via ``spark.sql.orc.filterPushdown``,
    on by default)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC writer — the interchange sink for ORC-native warehouses
    (Hive-lineage stacks); parquet remains the engine's primary format."""
    df.write.mode(mode).orc(path)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, delimiter: str = ","
) -> DataFrame:
    """CSV reader with a mandatory explicit schema (same no-inference
    posture as :func:`read_jsonl`; inference would scan twice)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
