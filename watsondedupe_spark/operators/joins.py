"""Custom join operators Spark lacks as built-ins: as-of and range joins.

Both are compositions of existing DataFrame ops (the (a) strategy of the
custom-operator ladder) — no UDF, no per-row Python:

- **as-of join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union+window merge
  formulation: tag both sides, sort within key by (ts, side), carry the
  last non-null right value forward. ONE shuffle on the key, state O(1)
  per row — at 100 TB this beats the naive range-join (which explodes to
  |left| x |matching right| pairs before aggregation).
- **range join**: inner join on key equality + interval containment —
  Spark handles the equi-part as a hash join and the range as a post
  filter; the helper exists to make the pattern a named, tested thing
  (the reference's one hand-written SQL is exactly this shape, O10,
  SqliteProvider.cs:378-382).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """All left rows + the most recent right row at-or-before each left
    row's ``ts``, per ``on`` key.

    ``right_cols`` are the right-side payload columns to carry (default:
    everything except the key and timestamp). Ties on ``ts`` resolve
    right-before-left (a right row AT the left timestamp matches);
    among right rows sharing a timestamp, pass ``tie_cols`` (e.g. an
    event id) to make which one wins deterministic — without it the
    winner is whichever the sort emits last. ``tolerance`` (e.g.
    ``"30 minutes"``) nulls matches older than ``left.ts - tolerance`` —
    the bounded-staleness form.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    tie_cols = tie_cols or []

    # union schema = left columns + _side tag + right payload columns;
    # each side fills the other's columns with typed nulls
    lt = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *[
            F.col(c) if c in (on, ts) or c in right_cols else F.lit(None).cast(lt.schema[c].dataType).alias(c)
            for c in lt.columns
        ]
    ).withColumn("_side", F.lit(0))

    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(),
            F.col("_side").asc(),
            *[F.col(c).asc_nulls_first() for c in tie_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *[c for c in left.columns],
        "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_cols],
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("_r_ts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        stale = F.col("_r_ts") < F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        for c in right_cols:
            out = out.withColumn(f"_r_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"_r_{c}")))
    out = out.drop("_r_ts")
    return out.withColumnsRenamed({f"_r_{c}": c for c in right_cols})


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point: str,
    start: str,
    length: str,
) -> DataFrame:
    """Join each point row to the interval row (same ``on`` key) whose
    [start, start+length) contains ``point`` — the O10 predicate as a
    two-table join. Equi-key hash join first, containment filter after;
    Catalyst plans exactly that."""
    return points.join(intervals, on).filter(
        (F.col(start) <= F.col(point)) & (F.col(start) + F.col(length) > F.col(point))
    )
