"""watsondedupe_spark — a PySpark-native data-deduplication and analytics engine.

A from-scratch engine with the query and data-processing capabilities of
jchristn/WatsonDedupe (reference: /root/reference, C#), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, parquet
columnar storage, and Arrow-batched Pandas UDFs only where built-ins
cannot express the semantics (the content-defined chunker).

Layout
------
- ``session``    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``schemas``    — explicit StructTypes for the index tables (no inference)
- ``chunking``   — content-defined chunking (reference DedupeLibrary.cs:605-717)
- ``keys``       — chunk/object key encoding (reference DedupeCommon.cs:98-181)
- ``engine``     — the dedupe index engine: write/get/delete/list/stats
- ``store``      — parquet-backed table persistence with snapshot commits
- ``operators``  — analytics + LLM-pipeline operators (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``streaming``  — Structured Streaming windows/watermark/dedup helpers
"""

__version__ = "0.1.0"

from watsondedupe_spark.chunking import ChunkSettings, chunk_bytes  # noqa: F401
from watsondedupe_spark.keys import chunk_key  # noqa: F401
