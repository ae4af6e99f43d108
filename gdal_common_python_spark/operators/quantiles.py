"""Exact distributed quantiles via a count-histogram — the scale-correct
shape for percentiles over discrete-valued columns (token counts, lengths,
scores): one map-side-combined groupBy collapses the corpus to (group,
value, count) rows — shuffle ∝ DISTINCT VALUES per group, never rows — then
one window builds the cumulative distribution and a single conditional
aggregation picks every requested rank. Contrast with approxQuantile
(approximate, non-deterministic across runs) and sort-based exact
percentiles (full-data shuffle): this is exact, deterministic, and moves
kilobytes at 100 TB for bounded-cardinality values.

Nearest-rank convention: q-quantile = the smallest value whose cumulative
count >= ceil(q * n). ceil on the identical IEEE product is identical in
Spark and DuckDB, so the result is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """(group_cols..., n, q_<pct> for each q) — exact nearest-rank
    quantiles of `value_col` per group. NULL values are excluded (they
    have no rank); empty groups disappear with them."""
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).alias("__v"))
        .agg(F.count("*").alias("__c"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__v")
    cum = counts.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy(*group_cols))
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for q in qs:
        rank = F.ceil(F.lit(float(q)) * F.col("__n"))
        name = f"q_{str(q).replace('.', '_')}"
        aggs.append(F.min(F.when(F.col("__cum") >= rank, F.col("__v"))).alias(name))
    return cum.groupBy(*group_cols).agg(*aggs)


def exact_quantiles_oracle_sql(
    rel: str, group_cols: list[str], value_col: str, qs: list[float]
) -> str:
    g = ", ".join(group_cols)
    picks = []
    for q in qs:
        name = f"q_{str(q).replace('.', '_')}"
        picks.append(
            f"min(CASE WHEN cum >= ceil({float(q)!r} * n) THEN v END) AS {name}"
        )
    return f"""
WITH counts AS (
  SELECT {g}, {value_col} AS v, count(*) AS c
  FROM {rel} WHERE {value_col} IS NOT NULL
  GROUP BY {g}, {value_col}
),
cum AS (
  SELECT {g}, v, c,
         sum(c) OVER (PARTITION BY {g} ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY {g}) AS n
  FROM counts
)
SELECT {g}, CAST(max(n) AS BIGINT) AS n, {", ".join(picks)}
FROM cum GROUP BY {g}
"""
