"""Round-5 ADVICE fixes, each pinned by the adversarial input the advisor
described:

- nearest_zone_distance: the pass-B prune keeps every edge that can still
  TIE at the dist_micro quantum — an edge with equal dist_micro, larger
  real distance, and smaller zone_id must win exactly like the oracle's
  full cross join (ADVICE medium).
- edge_intersections: duplicated edge rows in the input collapse to ONE
  output row in both engines (oracle e CTE is now SELECT DISTINCT).
- zone_mean_center: the shared PIP+parse intermediate is persisted once
  and released via the module handle convention.
- geo_points: the regexp-free parse nulls malformed POINT spans under the
  SAME strictness as the oracle regexp (3-coordinate, space-before-paren,
  double-paren forms).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators import spatial_join as sj

DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

FAR_ZONE = {
    "zone_id": [7],
    "srid": [4326],
    "rings": [[[[50.0, 50.0], [52.0, 50.0], [52.0, 52.0], [50.0, 52.0], [50.0, 50.0]]]],
    "rings4326": [[[[50.0, 50.0], [52.0, 50.0], [52.0, 52.0], [50.0, 52.0], [50.0, 50.0]]]],
}


def _zones(spark):
    return spark.createDataFrame(pd.DataFrame(FAR_ZONE)).withColumn(
        "bbox4326",
        F.expr(
            "named_struct('xmin', 50.0d, 'ymin', 50.0d, 'xmax', 52.0d, 'ymax', 52.0d)"
        ),
    )


# ---------- nearest_zone_distance tie-at-the-quantum prune (medium) ---------


def test_nearest_zone_tie_at_quantum_survives_prune(spark):
    """The advisor's exact scenario: edge B has a LARGER real distance than
    the winner A but the SAME floor-quantized dist_micro and a SMALLER
    zone_id, and its bbox lower bound exceeds the pass-A endpoint bound
    (lb2 > R2) — the old prune dropped it; the oracle's full cross join
    keeps it and its (dist_micro, zone_id) struct-min picks it."""
    docs = spark.createDataFrame(
        [("d0", [("geo", "POINT(0 0)", None, 0)])], DOCS_SCHEMA
    )
    zones = _zones(spark)
    # edge A (zone 5): vertical segment at x=1 with an endpoint AT distance
    # 1.0 -> pass-A bound R2 = 1.0 exactly, true distance 1.0,
    # dist_micro = 1_000_000.
    # edge B (zone 1): vertical segment at x = 1.0000005 -> true distance
    # 1.0000005 (dist_micro = 1_000_000, ties), lb2 = 1.0000005^2 > R2.
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                (5, 1.0, 0.0, 1.0, 1.0),
                (1, 1.0000005, -1.0, 1.0000005, 1.0),
            ],
            columns=["zone_id", "ex1", "ey1", "ex2", "ey2"],
        )
    )
    out = sj.nearest_zone_distance(spark, docs, zones, edges).collect()
    assert len(out) == 1
    r = out[0]
    # struct-min on (dist_micro, zone_id): both edges quantize to 1_000_000,
    # zone 1 < zone 5 must win — as the oracle's QUALIFY row_number does
    assert r.dist_micro == 1_000_000
    assert r.nearest_zone == 1


def test_nearest_zone_prune_still_exact_on_plain_input(spark):
    """The widened cutoff changes no winner on a regular input."""
    docs = spark.createDataFrame(
        [("d0", [("geo", "POINT(5 0)", None, 0)])], DOCS_SCHEMA
    )
    zones = _zones(spark)
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                (7, 0.0, 0.0, 2.0, 0.0),
                (7, 2.0, 0.0, 2.0, 2.0),
                (7, 2.0, 2.0, 0.0, 2.0),
                (7, 0.0, 2.0, 0.0, 0.0),
            ],
            columns=["zone_id", "ex1", "ey1", "ex2", "ey2"],
        )
    )
    out = sj.nearest_zone_distance(spark, docs, zones, edges).collect()
    assert [(r.nearest_zone, r.dist_micro) for r in out] == [(7, 3_000_000)]


# ---------- edge_intersections on duplicated edge rows (low) ----------------


def test_edge_intersections_duplicated_edges_agree_with_oracle(spark, tmp_path):
    """Input with each edge row repeated: the engine's pair-identity
    dropDuplicates emits ONE row per crossing; the oracle's SELECT
    DISTINCT e CTE now matches instead of emitting k*m rows."""
    rows = [
        (1, -1.0, 0.0, 1.0, 0.0),  # horizontal through origin
        (1, -1.0, 0.0, 1.0, 0.0),  # duplicated
        (2, 0.0, -1.0, 0.0, 1.0),  # vertical through origin
        (2, 0.0, -1.0, 0.0, 1.0),  # duplicated
        (2, 0.0, -1.0, 0.0, 1.0),  # triplicated
    ]
    pdf = pd.DataFrame(rows, columns=["zone_id", "ex1", "ey1", "ex2", "ey2"])
    edges = spark.createDataFrame(pdf)
    got = sj.edge_intersections(spark, edges).collect()
    assert [(r.zone_a, r.zone_b, r.ix, r.iy) for r in got] == [(1, 2, 0.0, 0.0)]

    pq = str(tmp_path / "dup_edges.parquet")
    pdf.to_parquet(pq)
    sql = sj.edge_intersections_oracle_sql(f"read_parquet('{pq}')")
    con = duckdb.connect()
    oracle = con.sql(sql).fetchall()
    assert len(oracle) == len(got) == 1


# ---------- zone_mean_center cache hygiene (low) ----------------------------


def test_zone_mean_center_persists_and_releases(spark, docs, zones):
    from gdal_common_python_spark.operators.util import _HANDLE_ATTR, release

    out = sj.zone_mean_center(spark, docs, zones)
    handles = getattr(out, _HANDLE_ATTR, [])
    assert handles, "zone_mean_center should persist its shared zp intermediate"
    out.count()
    assert any(h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles)
    release(out)
    assert all(
        not (h.storageLevel.useMemory or h.storageLevel.useDisk) for h in handles
    )


# ---------- geo_points strict parse parity (low) ----------------------------

MALFORMED = [
    "POINT(1 2 3)",      # 3 coordinates -> NULL (the strict 2-token gate)
    "POINT (1 2)",       # space before paren: last-( scan parses anyway
    "POINT((1 2)",       # double open paren: last-( scan parses anyway
    "POINT(1,2)",        # comma separator -> 1 token -> NULL
    "POINT(1  2)",       # double space -> 3 tokens -> NULL
    "POINT( 1 2)",       # leading space inside parens -> 3 tokens -> NULL
    "POINT(a b)",        # non-numeric tokens -> try_cast NULLs
    "POINT(. .)",        # uncastable tokens -> try_cast NULLs
    "POINT(1 b)",        # mixed: x parses, y NULLs — on BOTH sides
    "POINT",             # no parens at all
    "POINT(1 2 )",       # trailing space -> 3 tokens (split keeps empties)
    "POINT(1 2)",        # well-formed control
    "POINT(+1e2 -2.5)",  # sign/exponent forms
]


def test_geo_points_matches_oracle_parse_on_malformed(spark, tmp_path):
    """Engine parse and the oracle's point_parse_sql are the same pure
    function — asserted over adversarial span fixtures, not just synth."""
    rows = [(f"d{i}", [("geo", t, None, 0)]) for i, t in enumerate(MALFORMED)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r.doc_id: (r.x, r.y) for r in sj.geo_points(docs).collect()}

    pq = str(tmp_path / "malformed_docs.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    sql = sj.point_parse_sql(f"read_parquet('{pq}')")
    oracle = {d: (px, py) for d, _, px, py in con.sql(sql).fetchall()}
    assert got == oracle
    # spot-pin the semantics so a parallel bug in both parses can't hide
    assert got["d0"] == (None, None)    # 3-coordinate form nulls out
    assert got["d8"] == (1.0, None)     # per-token try_cast, uncoupled
    assert got["d11"] == (1.0, 2.0)
    assert got["d12"] == (100.0, -2.5)
