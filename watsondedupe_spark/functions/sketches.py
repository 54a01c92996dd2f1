"""Count-Min sketch — a mergeable frequency sketch as pure DataFrame ops.

Spark ships HLL (approx_count_distinct) and KLL-style quantiles
(approx_percentile) but no frequency sketch. This is the distributed
formulation: every item emits ``depth`` (row, col) cells via independent
xxhash64 seeds; a groupBy over cells produces the (depth x width) count
table — ONE shuffle of at most ``depth * width`` distinct keys no matter
how many input rows, and map-side partial aggregation compresses each
partition to the sketch size before the exchange. Point estimates take
min over the item's ``depth`` cells (classic CM guarantee: estimate >=
true count, overshoot <= eps * N with prob 1 - delta for
width = ceil(e / eps), depth = ceil(ln(1 / delta))).

Sketches merge by cell-wise addition (union-of-streams), which is how a
1000-executor fleet folds per-shard sketches into a corpus-wide one —
the same mergeability contract as Spark's own ImperativeAggregates.

Engine-side addition (SURVEY.md §2.2 sketches); no reference analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_sketch(
    df: DataFrame, col: str | Column, depth: int = 5, width: int = 2048
) -> DataFrame:
    """Build the sketch: one row per non-empty cell ``(d, w, cnt)``.

    The result has at most ``depth * width`` rows regardless of input
    size — collect it, broadcast it, store it, or union several and
    re-aggregate via :func:`cm_merge`.
    """
    col = F.col(col) if isinstance(col, str) else col
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(col, F.lit(d)), F.lit(width)).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of compatible sketches (same depth/width)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame, items: DataFrame, col: str | Column, depth: int = 5, width: int = 2048
) -> DataFrame:
    """Estimated frequency for each row of ``items``: min over the
    item's ``depth`` cells. The sketch side is tiny (<= depth * width
    rows) so it broadcasts; the probe is a broadcast join + min — no
    shuffle of ``items``."""
    col = F.col(col) if isinstance(col, str) else col
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(col, F.lit(d)), F.lit(width)).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("*", F.col("c.d").alias("d"), F.col("c.w").alias("w")).drop("c")
    joined = probes.join(F.broadcast(sketch), ["d", "w"], "left").fillna(
        {"cnt": 0}
    )
    return (
        joined.groupBy(*[c for c in items.columns])
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )


def cm_prune_heavy(
    items: DataFrame,
    col: str | Column,
    sketch: DataFrame,
    min_count_expr,
    width: int = 2048,
) -> DataFrame:
    """Map-side heavy-hitter pruning: keep only rows whose item COULD
    reach ``min_count_expr`` occurrences, judged by one Count-Min row.

    Because a CM cell only ever over-counts, ``cell < threshold`` proves
    the item is below threshold — dropping it is exact (no false
    negatives). The probe is a broadcast join against the ``d = 0`` cell
    row of ``sketch`` (<= ``width`` rows), evaluated before any shuffle
    of ``items``, so the expensive exact aggregation downstream only
    sees survivors. This is the sketch-guided exact pattern: sketch for
    the prune, exact arithmetic for the answer.

    ``min_count_expr`` is a Column evaluated against ``items``'s columns,
    so callers can derive the threshold from the sketch itself (e.g. a
    share of total mass cross-joined in) without an extra data pass.
    """
    col = F.col(col) if isinstance(col, str) else col
    d0 = sketch.filter(F.col("d") == 0).select(
        F.col("w").alias("__cw"), F.col("cnt").alias("__cell_cnt")
    )
    probed = items.withColumn(
        "__w", F.pmod(F.xxhash64(col, F.lit(0)), F.lit(width))
    ).join(F.broadcast(d0), F.col("__w") == F.col("__cw"), "left")
    return (
        probed.filter(F.coalesce(F.col("__cell_cnt"), F.lit(0)) >= min_count_expr)
        .drop("__w", "__cw", "__cell_cnt")
    )
