"""Spatial write layout: Z-order (Morton) interleaving as a pure column
expression. Sorting by lng alone clusters row groups in one dimension only
— a bbox filter then prunes on lng but reads every lat. Z-ordering
interleaves quantized lng/lat bits so row-group min/max stats are tight in
BOTH axes (the Spark-native replacement for the reference's KD-tree AABB
pruning, cluster/cluster.go:1026-1029; same idea as Delta's OPTIMIZE
ZORDER).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """[lo, hi] -> integer in [0, 2^bits)."""
    scaled = (col - F.lit(lo)) / F.lit(hi - lo) * F.lit((1 << bits) - 1)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << bits) - 1)))
    return clamped.cast("long")


def zorder_key(
    lng: Column,
    lat: Column,
    bits: int = 16,
    west: float = -180.0,
    south: float = -90.0,
    east: float = 180.0,
    north: float = 90.0,
) -> Column:
    """Morton key interleaving ``bits`` bits of each quantized coordinate.

    Built as 2*bits shift/mask/or expressions — entirely JVM-side codegen,
    no UDF; constant-folded shifts."""
    x = _quantize(lng, west, east, bits)
    y = _quantize(lat, south, north, bits)
    key = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    lng_col: str = "lng",
    lat_col: str = "lat",
    num_files: int = 8,
    bits: int = 16,
    block_size: int | None = None,
) -> None:
    """Write parquet range-partitioned AND sorted by the Morton key: each
    file (and row group within it) covers a compact spatial tile, so bbox
    scans prune on both lng and lat min/max stats. ``block_size`` tunes
    row-group granularity (smaller groups = finer pruning, more footer
    overhead)."""
    # Quantize to the DATA bounds, not the world: a Morton curve over a
    # rectangle the data only partially occupies zigzags across quadrant
    # boundaries, and row groups containing those jumps get huge bounding
    # boxes (observed: 2x WORSE than a plain lng sort). One cheap agg pass
    # fixes it.
    b = df.agg(
        F.min(lng_col).alias("w"), F.max(lng_col).alias("e"),
        F.min(lat_col).alias("s"), F.max(lat_col).alias("n"),
    ).collect()[0]
    if b.w is None:
        # empty input: min/max are NULL and the quantizer would divide by
        # None — there is nothing to order, so write the empty frame as-is
        df.write.mode("overwrite").option("compression", "zstd").parquet(path)
        return
    keyed = df.withColumn(
        "_z",
        zorder_key(
            F.col(lng_col), F.col(lat_col), bits,
            west=b.w, south=b.s, east=b.e, north=b.n,
        ),
    )
    writer = (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", "zstd")
    )
    if block_size:
        writer = writer.option("parquet.block.size", str(block_size))
    writer.parquet(path)
