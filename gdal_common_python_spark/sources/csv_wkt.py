"""CSV + WKT vector source — the ogr2ogr CSV-driver convenience.

The reference opens CSVs through OGR's CSV driver (guess driver,
features.py:27-43); here the attribute columns come straight from
``spark.read.csv`` and the geometry column is parsed from WKT by the
engine's own WKT-lite parser (`kernels.geom.parse_wkt` — the same subset
the geo spans carry): POINT -> (x, y) doubles, POLYGON / MULTIPOLYGON ->
the engine's ``rings`` shape (multipolygon parts flattened, even-odd
semantics) plus the derived ``bbox`` struct the spatial operators expect.

100 TB shape: the CSV scan is Spark's native distributed reader; the WKT
parse is ONE Arrow-batched mapInPandas projection (no shuffle, no
collect) — each partition parses its own rows. Ill-formed WKT raises by
default (``on_error='raise'``) or drops the row (``'skip'``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels import geom as _geom

_RINGS_T = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))


def parse_wkt_points(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """POINT rows -> original columns (minus wkt) + x, y doubles. Pure
    codegen (string scans, the spatial-join gate discipline) — rows whose
    WKT is not a POINT get null x/y."""
    s = F.col(wkt_col)
    inner = F.regexp_extract(s, r"^\s*POINT\s*\(\s*([^)]*?)\s*\)\s*$", 1)
    x = F.when(inner != "", F.split(inner, r"\s+").getItem(0).cast("double"))
    y = F.when(inner != "", F.split(inner, r"\s+").getItem(1).cast("double"))
    keep = [c for c in df.columns if c != wkt_col]
    return df.select(*keep, x.alias("x"), y.alias("y"))


def parse_wkt_polygons(
    df: DataFrame, wkt_col: str = "wkt", on_error: str = "raise"
) -> DataFrame:
    """POLYGON / MULTIPOLYGON rows -> original columns (minus wkt) +
    ``rings`` + ``bbox`` (the spatial operators' input shape). One
    Arrow-batched mapInPandas projection; no shuffle."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    keep = [f for f in df.schema.fields if f.name != wkt_col]
    out_schema = T.StructType(
        list(keep)
        + [
            T.StructField("rings", _RINGS_T),
            T.StructField(
                "bbox",
                T.StructType(
                    [
                        T.StructField("xmin", T.DoubleType()),
                        T.StructField("ymin", T.DoubleType()),
                        T.StructField("xmax", T.DoubleType()),
                        T.StructField("ymax", T.DoubleType()),
                    ]
                ),
            ),
        ]
    )
    names = [f.name for f in keep]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                wkt = getattr(r, wkt_col)
                try:
                    kind, rings = _geom.parse_wkt(wkt)
                    if kind != "polygon":
                        raise ValueError(f"not a polygon WKT: {wkt[:40]!r}")
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                xs = [p[0] for ring in rings for p in ring]
                ys = [p[1] for ring in rings for p in ring]
                rows.append(
                    tuple(getattr(r, n) for n in names)
                    + (
                        [[[float(x), float(y)] for x, y in ring] for ring in rings],
                        dict(
                            xmin=float(min(xs)), ymin=float(min(ys)),
                            xmax=float(max(xs)), ymax=float(max(ys)),
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=names + ["rings", "bbox"])

    return df.mapInPandas(kernel, out_schema)


def round_trip_points_csv(spark: SparkSession, pts: DataFrame, path: str) -> DataFrame:
    """Verification bridge for the CSV+WKT source (round-5: promotes the
    pytest-only source to an oracle gate): serialize a point table
    (point_id, tag, x, y) to an on-disk CSV whose geometry column is
    ``POINT(x y)`` WKT with ``repr`` doubles (repr round-trips IEEE754
    exactly, so cast-back equals the original bit-for-bit), then open it
    with the REAL distributed reader (`read_csv_wkt` -> spark.read.csv +
    the codegen POINT parse) and return (point_id, tag, x, y). An oracle
    reading the ORIGINAL parquet must hash-match — proving the source's
    scan + parse is lossless end-to-end.

    The serialize side is driver-side pandas and therefore DIMENSION-
    bounded by design (it exists to produce the fixture); the read side —
    the thing under test — is the production distributed path."""
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    import csv

    pdf = pts.select("point_id", "tag", "x", "y").toPandas().sort_values("point_id")
    with open(path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["point_id", "tag", "wkt"])
        for r in pdf.itertuples(index=False):
            # float(...) before repr: itertuples yields numpy.float64, whose
            # repr under NumPy >= 2 is 'np.float64(1.5)' — malformed WKT;
            # the csv module handles tag quoting (commas/quotes in tags)
            wr.writerow(
                [r.point_id, r.tag, f"POINT({float(r.x)!r} {float(r.y)!r})"]
            )
    out = read_csv_wkt(spark, path, geometry_type="point")
    return out.select(
        F.col("point_id").cast("long").alias("point_id"), "tag", "x", "y"
    )


def read_csv_wkt(
    spark: SparkSession,
    path: str,
    geometry_type: str = "polygon",
    wkt_col: str = "wkt",
    header: bool = True,
    infer_schema: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Open a CSV layer with a WKT geometry column, OGR-CSV-driver style:
    native distributed CSV scan, then the matching WKT parse
    (``geometry_type`` 'point' -> x/y codegen scan, 'polygon' ->
    rings/bbox Arrow projection)."""
    df = spark.read.csv(path, header=header, inferSchema=infer_schema)
    if geometry_type == "point":
        return parse_wkt_points(df, wkt_col=wkt_col)
    if geometry_type == "polygon":
        return parse_wkt_polygons(df, wkt_col=wkt_col, on_error=on_error)
    raise ValueError(f"geometry_type must be 'point' or 'polygon', got {geometry_type!r}")
