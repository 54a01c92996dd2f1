"""Python UDTFs — the table-function side of the extension surface.

The reference's extension surface is its callback triple + pluggable
DbProvider (DedupeCallbacks.cs:74-83, DbProvider.cs:18-151); on Spark
the equivalent spectrum is columnar expressions (functions/), Arrow
pandas UDFs (the chunker), stateful applyInPandasWithState
(streaming/), and — covered here — user-defined TABLE functions usable
from SQL with LATERAL, for one-row-to-many-rows logic that must run in
Python.

UDTFs are the right tool only when the expansion logic genuinely needs
Python; pure column math should stay in JVM expressions (see
chunk_spans_df below for the expression-only twin used at scale).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="position: int, address: bigint, length: int")
class ChunkSpans:
    """Fixed-size chunk spans for an object of ``total_len`` bytes —
    the layout math of the derived chunk index (dedupe_index.OM_SQL) as
    a reusable table function: ``LATERAL chunk_spans(length(text), 64)``.
    """

    def eval(self, total_len: int, chunk: int):
        if total_len is None or total_len <= 0 or chunk is None or chunk <= 0:
            return
        pos = 0
        addr = 0
        while addr < total_len:
            yield pos, addr, min(chunk, total_len - addr)
            pos += 1
            addr += chunk


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (idempotent)."""
    spark.udtf.register("chunk_spans", ChunkSpans)
