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

from functools import reduce

from pyspark.sql import Column, DataFrame
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


# one long per bit position; index 63 is the sign bit (two's complement)
_BIT_MASKS = [1 << i for i in range(63)] + [-(1 << 63)]


def _bit_mask(pos_in_word: Column) -> Column:
    """``1L << pos`` as an O(1) literal-array lookup (F.shiftleft only
    accepts a constant shift from Python)."""
    return F.element_at(F.lit(_BIT_MASKS), pos_in_word.cast("int") + F.lit(1))


def bloom_filter_build(
    keys: DataFrame, key: str, n_bits: int = 1 << 17, n_hashes: int = 3
) -> list[int]:
    """Build a Bloom filter over ``keys[key]`` as a dense little-endian
    bit array packed into ``n_bits // 64`` longs.

    Spark's own runtime row-filter uses exactly this structure
    (``BloomFilterAggregate``), but it is not registered in the public
    function registry, so this is the portable DataFrame formulation:
    each key emits ``n_hashes`` bit positions (``xxhash64(key, seed)``
    mod ``n_bits``), positions fold into per-word masks with a
    distributed ``bit_or``, and only the packed words — ``n_bits/8``
    bytes, independent of key count — come back to the driver. That
    word table IS the broadcast payload; the keys themselves never
    leave the executors.
    """
    n_words = n_bits // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
                    for i in range(n_hashes)
                ]
            )
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / F.lit(64)).cast("int").alias("w"),
            _bit_mask(F.pmod(F.col("p"), F.lit(64))).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("mask"))
        .collect()
    )
    arr = [0] * n_words
    for row in words:
        arr[row["w"]] = row["mask"]
    return arr


def bloom_might_contain(
    bloom: list[int], key: Column | str, n_hashes: int = 3
) -> Column:
    """Membership predicate against a `bloom_filter_build` array —
    pure JVM bit arithmetic on an array literal (element_at on an array
    is O(1); the whole test stays inside whole-stage codegen)."""
    key = F.col(key) if isinstance(key, str) else key
    n_bits = len(bloom) * 64
    tests = []
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        word = F.element_at(F.lit(bloom), (p / F.lit(64)).cast("int") + F.lit(1))
        bit = _bit_mask(F.pmod(p, F.lit(64)))
        tests.append(word.bitwiseAND(bit) != F.lit(0))
    return reduce(lambda a, b: a & b, tests)


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to ``keys`` with a Bloom pre-filter: the fact
    scan drops ~all non-matching rows BEFORE any shuffle, for the cost
    of broadcasting ``n_bits/8`` bytes — the pattern that makes a
    selective dim→fact semi-join viable at 100 TB when the key set is
    too large to broadcast outright. ``exact=True`` (default) follows
    with the real left-semi join over the survivors, so results carry
    no false positives; ``exact=False`` returns the (superset)
    Bloom-only filter for pipelines that tolerate fpp.
    """
    dim_key = dim_key or fact_key
    dim = keys.select(F.col(dim_key).alias(fact_key)).distinct()
    bloom = bloom_filter_build(dim, fact_key, n_bits=n_bits, n_hashes=n_hashes)
    pruned = fact.filter(bloom_might_contain(bloom, fact_key, n_hashes=n_hashes))
    if exact:
        pruned = pruned.join(dim, fact_key, "left_semi")
    return pruned


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


def rrf_fuse(
    ranked: "list[DataFrame]",
    k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (Cormack et
    al. 2009) — the multi-query, multi-arm generalization of the graded
    ``docs_hybrid_rrf`` shape.

    Each input is ``(query_col, id_col, rank_col)`` with rank 1 = best
    (typically a bounded top-K per query from an index probe, so every
    input is |queries| * K rows — never corpus-sized). Lists are merged
    with full-outer joins on (query, doc); the fused score sums
    ``1/(k + rank_i)`` left to right in input order (fixed IEEE
    accumulation — engine-reproducible), treating a missing rank as a
    zero contribution. Returns ``(query_col, id_col, rrf)``; callers
    top-k the result per query.

    At scale the joins run over the union of bounded candidate lists —
    the expensive work happened in the arms; fusion is O(N * |q| * K).
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    out = None
    for i, df in enumerate(ranked):
        part = df.select(
            F.col(query_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(f"_c{i}"),
        )
        out = part if out is None else out.join(part, [query_col, id_col], "full_outer")
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(ranked)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    return out.select(query_col, id_col, score.alias("rrf"))
