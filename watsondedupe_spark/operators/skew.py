"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles skewed JOINS at runtime; skewed
AGGREGATIONS whose per-key state is large (collect_list/collect_set,
large distinct sets) still funnel one hot key into one task. Salting
splits each key into ``n_salts`` sub-keys, aggregates partially per
sub-key (spreading the hot key over ``n_salts`` tasks), then merges the
partials — two shuffles, but each bounded by |key|/n_salts.

Plain algebraic aggregates (sum/count/min/max) do NOT need this: Spark's
partial aggregation already combines map-side. Use it when the aggregate
state itself is the problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Attach a uniform salt 0..n_salts-1 derived from a spread of the
    row (rand-free: deterministic, partition-stable)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """``groupBy(key).agg(count_distinct(value))`` that survives a key
    holding most of the table.

    Phase 1 groups on (key, salt) and dedups values inside each salt
    bucket; phase 2 sums the per-salt distinct counts. Values are routed
    to salts BY VALUE HASH, so the same value always lands in the same
    bucket and the per-salt counts are disjoint — summing them is exact,
    not approximate.
    """
    bucketed = df.select(
        F.col(key),
        F.col(value),
        F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt"),
    )
    per_salt = bucketed.groupBy(key, "_salt").agg(
        F.count_distinct(value).alias("_partial")
    )
    return per_salt.groupBy(key).agg(F.sum("_partial").cast("long").alias("n_distinct"))


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salts: int = 16, max_size: int | None = None
) -> DataFrame:
    """``collect_set`` with the accumulation spread over salt buckets,
    flattened at merge. ``max_size`` truncates the merged set (sorted for
    determinism) — at scale an unbounded set per hot key is the bug, not
    a requirement."""
    bucketed = df.select(
        F.col(key),
        F.col(value),
        F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt"),
    )
    per_salt = bucketed.groupBy(key, "_salt").agg(F.collect_set(value).alias("_part"))
    merged = per_salt.groupBy(key).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias("values")
    )
    if max_size is not None:
        merged = merged.withColumn("values", F.slice("values", 1, max_size))
    return merged


def explode_salt(small: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate the SMALL side of a skewed join once per salt value, so
    it can equi-join a salted big side on (key, salt) — the classic
    manual skew-join (AQE does this at runtime for sort-merge joins;
    this is the explicit form for when AQE can't, e.g. aggregations
    downstream rely on the salted partitioning)."""
    return small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
    salt_col: str = "_salt",
) -> DataFrame:
    """Skewed equi-join: salt the BIG side, replicate the SMALL side.

    The big side's hot keys spread over ``n_salts`` shuffle partitions
    (deterministic row-spread salt, no rand()); the small side is
    replicated once per salt so every (key, salt) bucket still finds its
    match. Composition of :func:`salted` + :func:`explode_salt` — use
    when AQE's runtime skew split can't apply (broadcast-ineligible
    small side plus downstream ops pinned to the salted partitioning).
    Supported ``how``: inner / left — the replicated small side would
    multiply unmatched right rows under right/full outer.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    return (
        salted(big, n_salts, salt_col)
        .join(explode_salt(small, n_salts, salt_col), [*keys, salt_col], how)
        .drop(salt_col)
    )
