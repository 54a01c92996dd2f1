"""Z-order (Morton-curve) clustered writes — multi-column data skipping.

Directory partitioning prunes on ONE column; bucketing co-locates ONE
key. When scans filter on several columns at once (e.g. time AND user,
or both halves of a 2-D range), interleaving the bits of the columns
into a single Morton code and range-partitioning + sorting on it gives
every output file a tight bounding box in ALL dimensions — so parquet
min/max footer stats prune files for predicates on any participating
column. This is the layout Delta's OPTIMIZE ZORDER BY produces; here it
is a pure DataFrame formulation (bit arithmetic + repartitionByRange),
no table format required.

The reference has no analogous layout control (its chunk files are
named by content hash — Cli/Program.cs:381-403); this is engine-side
scale posture per SURVEY.md §2.2.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) as a long — the fixed-grid
    normalization step before bit interleaving. Callers pass known
    domain bounds (at 100 TB you know them, or compute them once)."""
    col = F.col(col) if isinstance(col, str) else col
    cells = (1 << bits) - 1
    scaled = ((col - F.lit(lo)) / F.lit(float(hi - lo)) * F.lit(cells)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells), scaled))


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already-quantized,
    non-negative) column into one Morton code. All shifts are Python
    constants, so the whole expression is static bit arithmetic inside
    whole-stage codegen — no UDF. ``len(cols) * bits`` must be < 63."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if n * bits >= 63:
        raise ValueError(f"{n} cols x {bits} bits overflow a signed long")
    parts = []
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, b * n + i))
    return reduce(lambda a, x: a.bitwiseOR(x), parts).alias("zvalue")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[Column | str],
    bits: int = 16,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Morton curve of
    ``cols`` (pre-quantized via `quantize` or already small ints):
    range-partition on the z-value (one shuffle, contiguous curve
    segments per file), sort within each file so row groups inherit the
    locality too, then drop the helper column. Readers need no special
    support — parquet footer min/max stats on the ORIGINAL columns do
    the pruning."""
    zdf = df.withColumn("_z", zvalue(cols, bits=bits))
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
