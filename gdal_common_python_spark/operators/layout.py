"""Spatial data layout at corpus scale — Z-order keys and hierarchical
cell rollups, all native Column expressions (JVM codegen, zero Python).

The reference has no storage-layout story at all (it streams features
one-by-one through OGR handles, lib/datasource.py); at 10^12 documents the
dominant cost is the SCAN, and scan cost is decided by layout. Two tools:

- ``zorder_key``: Morton-interleave the cell grid indices of a point into
  one long. Range-partitioning + sorting by this key clusters spatially
  adjacent rows into the same files, so parquet row-group min/max stats
  prune bbox queries server-side — the same trick Delta/Iceberg OPTIMIZE
  ZORDER applies, derived here from the engine's own cell scheme
  (kernels/cells.py: ix/iy quadtree indices).
- ``cell_rollup``: multi-resolution aggregation pyramid (H3-style res 7-12
  rollup): aggregate once at the finest resolution, then fold each coarser
  level from the PREVIOUS level by parent-cell summation — one shuffle over
  the raw data total; every coarser level aggregates an exponentially
  smaller input (never the raw table again).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .spatial_join import cell_expr

_RES_SHIFT, _IX_SHIFT = 58, 29
_IDX_MASK = (1 << 29) - 1


def _grid_ix(lon_col: Column, res: int) -> Column:
    n = 1 << res
    return F.least(
        F.greatest(F.floor((lon_col + F.lit(180.0)) / F.lit(360.0 / n)), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")


def _grid_iy(lat_col: Column, res: int) -> Column:
    n = 1 << res
    return F.least(
        F.greatest(F.floor((lat_col + F.lit(90.0)) / F.lit(180.0 / n)), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")


def zorder_key(lon_col: Column, lat_col: Column, res: int = 12) -> Column:
    """Morton (Z-order) key of a lon/lat point at grid resolution ``res``:
    bit b of iy lands at position 2b, bit b of ix at 2b+1. Pure integer
    codegen expression — the formula ports verbatim to the DuckDB oracle."""
    if not 1 <= res <= 29:
        raise ValueError(f"res must be in [1, 29], got {res}")
    ix, iy = _grid_ix(lon_col, res), _grid_iy(lat_col, res)
    key = F.lit(0).cast("long")
    for b in range(res):
        key = key + F.shiftleft(F.shiftright(ix, b) % 2, 2 * b + 1)
        key = key + F.shiftleft(F.shiftright(iy, b) % 2, 2 * b)
    return key


def layout_by_zorder(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    res: int = 12,
    num_partitions: int | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster a point table for spatial locality: add the Z-order key and
    range-partition + sort by it. Writing the result gives files whose
    row-group min/max key (and therefore lon/lat) ranges are tight and
    mutually disjoint — bbox scans prune at the footer level.

    Range partitioning samples the key distribution (Spark's
    RangePartitioner), so skewed corpora (all points in one city) still
    split into balanced files rather than one hot partition."""
    out = df.withColumn(key_col, zorder_key(F.col(lon_col), F.col(lat_col), res))
    parts = [F.col(key_col)]
    if num_partitions:
        out = out.repartitionByRange(num_partitions, *parts)
    else:
        out = out.repartitionByRange(*parts)
    return out.sortWithinPartitions(key_col)


def _ancestor_cell(cell: Column, child_res: int, res: int) -> Column:
    """Native ancestor derivation (kernels.cells.parent) from a cell id at
    ``child_res`` up to ``res`` — pure long bit arithmetic."""
    ix = F.shiftright(cell, _IX_SHIFT) % F.lit(1 << _IX_SHIFT)
    iy = cell % F.lit(1 << _IX_SHIFT)
    s = child_res - res
    return (
        F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT).cast("long")
        + F.shiftleft(F.shiftright(ix, s), _IX_SHIFT)
        + F.shiftright(iy, s)
    )


def cell_rollup(
    points: DataFrame,
    lon_col: str = "x",
    lat_col: str = "y",
    res_fine: int = 12,
    res_coarse: int = 7,
) -> DataFrame:
    """Multi-resolution point-count pyramid over [res_coarse, res_fine]
    (the H3 res 7-12 hypertable-rollup shape): (res, cell, n_points).

    ONE linear plan, raw table scanned once: a wide aggregation at
    ``res_fine`` (map-side combine collapses each partition to its distinct
    cells before the shuffle), then every fine cell explodes into its
    ancestor chain — derived by bit arithmetic, no re-encoding — and a
    second aggregation sums the (exponentially smaller) pyramid. A naive
    per-level union would re-scan the raw table per level (O(levels^2)
    work under lazy evaluation); this shape is what survives 100 TB.
    Counts are exact at every level (the quadtree child partition of space
    is exact)."""
    if not 0 <= res_coarse <= res_fine:
        raise ValueError(f"need 0 <= res_coarse <= res_fine, got {res_coarse}/{res_fine}")
    fine = (
        points.select(cell_expr(F.col(lon_col), F.col(lat_col), res_fine).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
    )
    chain = F.array(
        *[
            F.struct(
                F.lit(r).alias("res"),
                _ancestor_cell(F.col("cell"), res_fine, r).alias("cell"),
            )
            for r in range(res_coarse, res_fine + 1)
        ]
    )
    return (
        fine.select(F.explode(chain).alias("a"), "n_points")
        .groupBy(F.col("a.res").alias("res"), F.col("a.cell").alias("cell"))
        .agg(F.sum("n_points").cast("long").alias("n_points"))
    )


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lon_col: Column, lat_col: Column, precision: int = 9) -> Column:
    """Standard geohash string of a lon/lat point (base32, lon bit first) —
    pure integer codegen, no UDF: quantize each axis to its bit budget
    (ceil/floor of 5p/2), Morton-interleave MSB-first, then pick base32
    digits with substring arithmetic. The formula ports verbatim to the
    DuckDB oracle, so the gate hash-compares the strings themselves."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2  # lon owns the even bit positions from MSB
    lat_bits = nbits // 2
    nx, ny = 1 << lon_bits, 1 << lat_bits
    ix = F.least(
        F.greatest(F.floor((lon_col + F.lit(180.0)) / F.lit(360.0) * nx), F.lit(0)),
        F.lit(nx - 1),
    ).cast("long")
    iy = F.least(
        F.greatest(F.floor((lat_col + F.lit(90.0)) / F.lit(180.0) * ny), F.lit(0)),
        F.lit(ny - 1),
    ).cast("long")
    # bit b of the geohash value (MSB = bit nbits-1): even offsets from the
    # top take lon bits (MSB first), odd offsets take lat bits
    val = F.lit(0).cast("long")
    for b in range(nbits):
        pos = nbits - 1 - b  # target bit position in the value
        if b % 2 == 0:
            src = ix, lon_bits - 1 - b // 2
        else:
            src = iy, lat_bits - 1 - b // 2
        val = val + F.shiftleft(F.shiftright(src[0], src[1]) % 2, pos)
    chars = [
        F.substring(
            F.lit(_GH32), (F.shiftright(val, 5 * (precision - 1 - i)) % 32 + 1).cast("int"), 1
        )
        for i in range(precision)
    ]
    return F.concat(*chars)
