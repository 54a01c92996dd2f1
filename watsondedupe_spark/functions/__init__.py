"""Column-function library — every scalar/vector expression the engine
defines, in one importable namespace.

All of these are Catalyst column expressions (JVM-side, codegen-able),
not Python UDFs; they are defined next to their operators and re-exported
here so users compose them like ``pyspark.sql.functions``:

    from watsondedupe_spark import functions as WF
    df.select(WF.chunk_key_col("data"), WF.cosine("a", "b"))

Reference analogues: chunk keying is O3 (DedupeCommon.cs:106-154), the
text/vector functions are engine-side additions (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from watsondedupe_spark.keys import chunk_key_col  # noqa: F401  (O3, columnar)
from watsondedupe_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
    l2_norm,
    sign_lsh_bucket,
)
from watsondedupe_spark.operators.text import (  # noqa: F401
    alpha_token_count,
    avg_token_len,
    est_bpe_tokens,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)


def normalized_text(col: Column | str) -> Column:
    """Canonical text for normalized dedup: lowercase, strip non
    [a-z0-9 ], collapse runs of spaces, trim (queries/llm_pipeline.py's
    docs_norm_dedup normalization, as a reusable expression)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""), " +", " "))


def content_hash(col: Column | str) -> Column:
    """md5 content hash for exact dedup grouping."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def interval_contains(address: Column | str, length: Column | str, position: int) -> Column:
    """The reference's one hand-written SQL predicate (O10,
    SqliteProvider.cs:378-382): does [address, address+length) contain
    ``position``?"""
    a = F.col(address) if isinstance(address, str) else address
    ln = F.col(length) if isinstance(length, str) else length
    return (a <= position) & (a + ln > position)
from watsondedupe_spark.functions.udtfs import ChunkSpans, register_udtfs  # noqa: F401,E402
