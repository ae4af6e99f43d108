"""Dissolve aggregations (A2-A4, lib/dissolve.py) — SURVEY §2.4.

Reference semantics:
- ``dissolve.all`` (lib/dissolve.py:8-68): every polygon (multipolygons
  exploded) unioned into one feature.
- ``dissolve.single_part`` (lib/dissolve.py:71-162): polygons grouped into
  connected components by pairwise ``Intersects``, one output feature per
  component with a FEAT_COUNT field.
- ``dissolve.on_field`` (lib/dissolve.py:165-302): group by field tuple(s),
  union per group, optional single-part split, FEAT_COUNT per output row.

Engine mapping: hash aggregation (groupBy + applyInPandas) instead of the
reference's O(groups*rows) linear scans. The per-group kernel computes
connected components with the exact ``polygon_intersects`` kernel (bbox
prefilter first). Output geometry is the TRUE member union (UnionCascaded
analog, lib/dissolve.py:268-274) as a disjoint piece collection computed
by kernels.geom.union_pieces — region- and area-exact with overlaps
removed; parity checks pin FEAT_COUNT, component counts, union areas and
grid membership, not boundary-walked vertices (SURVEY §2.5 parity note).

Scale note: per-group CC is quadratic in group size — right for dimension-
scale inputs (the reference's use case). For web-scale component finding use
the J2 self-join pair table + iterative min-id propagation instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels import geom


def _components(ringsets: list[list[np.ndarray]]) -> list[int]:
    """Union-find over pairwise intersects (bbox prefilter)."""
    n = len(ringsets)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    boxes = [geom.rings_bbox(r) for r in ringsets]
    for i in range(n):
        for j in range(i + 1, n):
            if find(i) == find(j):
                continue
            bi, bj = boxes[i], boxes[j]
            if bi[2] < bj[0] or bj[2] < bi[0] or bi[3] < bj[1] or bj[3] < bi[1]:
                continue
            if geom.polygon_intersects(ringsets[i], ringsets[j]):
                parent[find(i)] = find(j)
    return [find(i) for i in range(n)]


_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("component", T.IntegerType()),
        T.StructField("feat_count", T.LongType()),
        T.StructField("total_area", T.DoubleType()),
        T.StructField("union_area", T.DoubleType()),
        T.StructField("rings", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
    ]
)


def connected_components(
    spark, zones: DataFrame, group_col: str | None = None, max_iters: int = 50
) -> DataFrame:
    """Scale path for single-part dissolve (SURVEY §2.4 A3): connected
    components over the exact pairwise-intersects table via iterative
    min-label propagation with a path-halving hop (label := label[label]),
    converging in O(log(diameter)) rounds — each iteration is two joins +
    one aggregation — instead of the per-group quadratic kernel. Returns
    (zone_id, component).

    Every iteration reliable-checkpoints its label table: the update
    references the previous labels more than once, so without lineage
    truncation the logical plan DOUBLES per round and analysis cost goes
    exponential (measured: iteration 5 took 18 s on an 8-row input). The
    checkpoint bounds per-iteration plan size to a constant — the same
    discipline GraphFrames' connectedComponents applies — and, unlike
    cache(), adds nothing to executor storage accounting.

    The pair table comes from the overlay candidate machinery (bbox
    prefilter + exact kernel), i.e. the J2 self-join — at web scale swap the
    bbox broadcast for the cell-partitioned join; semantics are unchanged.
    The propagation loop itself (checkpoint discipline, path-halving hop,
    O(1)-state convergence probe) lives in graph.min_label_components,
    shared with the near-duplicate document clustering operator.
    """
    from pyspark.sql import functions as FF

    from .graph import min_label_components
    from .overlay import intersect_pairs

    pairs = intersect_pairs(spark, zones, zones).filter(FF.col("l_id") != FF.col("r_id"))
    if group_col is not None:
        # dissolve groups first (lib/dissolve.py:165): only same-group pairs merge
        g = zones.select(FF.col("zone_id"), FF.col(group_col).alias("__g"))
        pairs = (
            pairs.join(g.withColumnRenamed("zone_id", "l_id").withColumnRenamed("__g", "__gl"), "l_id")
            .join(g.withColumnRenamed("zone_id", "r_id").withColumnRenamed("__g", "__gr"), "r_id")
            .filter(FF.col("__gl") == FF.col("__gr"))
            .select("l_id", "r_id")
        )
    return min_label_components(
        spark, zones.select("zone_id"), pairs, id_col="zone_id", max_iters=max_iters
    )


_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("feat_count", T.LongType()),
        T.StructField("total_area", T.DoubleType()),
        T.StructField("rings", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
    ]
)


def dissolve_two_level(
    zones: DataFrame,
    on_fields: list[str] | None = None,
) -> DataFrame:
    """Scale path for A2/A4 (no single-part split): ONE spatial
    repartition shuffle (group + coarse cell of the first vertex), then
    partial unions per partition (mapInPandas) and one groupBy merge of
    the partials. Union is associative and commutative, so the result
    region/areas equal the single-kernel ``dissolve``; only the piece
    decomposition differs. This removes the one-task-per-group bottleneck:
    a dissolve-all over N partitions runs N parallel partial unions and a
    final merge of N piece collections, instead of one task taking every
    row (the classic partial+final aggregate shape, SURVEY §2.4 A2).
    Callers need not pre-repartition — the internal spatial repartition
    replaces any incoming layout."""
    if on_fields:
        keyed = zones.withColumn("group_key", F.concat_ws("", *on_fields))
    else:
        keyed = zones.withColumn("group_key", F.lit(""))
    # spatially coherent partials: hash-repartition on (group, coarse cell
    # of the first vertex) so overlapping members usually land in the SAME
    # partial and resolve locally — random partitioning spread overlaps
    # across partials, leaving the final merge to re-difference heavily
    # fragmented piece collections (measured 2.5x ring fragmentation and
    # 7x merge wall on the synth clusters)
    fx = F.col("rings")[0][0][0]
    fy = F.col("rings")[0][0][1]
    keyed = keyed.repartition(
        F.col("group_key"), F.floor(fx / F.lit(5.0)), F.floor(fy / F.lit(5.0))
    )

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for key, grp in pdf.groupby("group_key"):
                ringsets = [geom.rings_from_cell(r) for r in grp["rings"]]
                merged = geom.union_pieces(ringsets)
                rows.append(
                    dict(
                        group_key=key,
                        feat_count=len(ringsets),
                        total_area=float(sum(geom.polygon_area(rs) for rs in ringsets)),
                        rings=[r.tolist() for r in merged],
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PARTIAL_SCHEMA.fields])

    partials = keyed.select("group_key", "rings").mapInPandas(partial, _PARTIAL_SCHEMA)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["group_key"].iloc[0]
        merged = geom.union_pieces([geom.rings_from_cell(r) for r in pdf["rings"]])
        return pd.DataFrame(
            [
                dict(
                    group_key=key,
                    component=0,
                    feat_count=int(pdf["feat_count"].sum()),
                    total_area=float(pdf["total_area"].sum()),
                    union_area=float(geom.polygon_area(merged)),
                    rings=[r.tolist() for r in merged],
                )
            ]
        )

    return partials.groupBy("group_key").applyInPandas(final, _SCHEMA)


def dissolve(
    zones: DataFrame,
    on_fields: list[str] | None = None,
    single_part: bool = False,
) -> DataFrame:
    """A2 (on_fields=None, single_part=False), A3 (None, True),
    A4 (fields, either). Output: group_key, component, feat_count,
    total_area (sum of member signed areas), union_area (overlaps removed —
    the UnionCascaded measure, lib/dissolve.py:268-274), rings (the member
    union as a disjoint piece collection: region- and area-exact union
    geometry; see kernels.geom.union_pieces for the representation note)."""
    if on_fields:
        keyed = zones.withColumn("group_key", F.concat_ws("", *on_fields))
    else:
        keyed = zones.withColumn("group_key", F.lit(""))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["group_key"].iloc[0]
        ringsets = [geom.rings_from_cell(r) for r in pdf["rings"]]
        if single_part:
            comp = _components(ringsets)
        else:
            comp = [0] * len(ringsets)
        out = []
        for c in sorted(set(comp)):
            members = [i for i, cc in enumerate(comp) if cc == c]
            merged = geom.union_pieces([ringsets[i] for i in members])
            out.append(
                dict(
                    group_key=key,
                    component=int(c),
                    feat_count=len(members),
                    total_area=float(sum(geom.polygon_area(ringsets[i]) for i in members)),
                    union_area=float(geom.polygon_area(merged)),
                    rings=[r.tolist() for r in merged],
                )
            )
        return pd.DataFrame(out)

    return keyed.select("group_key", "rings").groupBy("group_key").applyInPandas(kernel, _SCHEMA)
