"""Attribute equi-join (J1) — fields.join semantics (fields.py:426-497).

Reference behavior re-expressed declaratively:
- left-outer: unmatched origin rows keep nulls (fields.py:484-485);
- ``error_if_many=True``: raise when a join key is duplicated on the join
  side (fields.py:461-462) — here a pre-join groupBy assert;
- relaxed mode: LAST match wins (the reference's dict build overwrites
  earlier keys, fields.py:455-460) — here an explicit row_number pick so the
  semantics are deterministic instead of scan-order-dependent;
- the join side's FID materializes as ``JOIN_FID`` (fields.py:470-479) — the
  caller passes ``fid_col`` for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


class ManyMatchesError(ValueError):
    pass


def attribute_join(
    origin: DataFrame,
    join: DataFrame,
    on_field: str,
    to_field: str,
    join_fields: list[str],
    error_if_many: bool = False,
    fid_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Left-outer equi-join adding `join_fields` from `join` to `origin`."""
    if error_if_many:
        dups = join.groupBy(to_field).count().filter(F.col("count") > 1).limit(1).collect()
        if dups:
            raise ManyMatchesError(
                f"join key {to_field}={dups[0][0]!r} matches multiple rows (error_if_many)"
            )
    sel = [F.col(to_field).alias("__key")] + [F.col(c) for c in join_fields]
    if fid_col:
        sel.append(F.col(fid_col).alias("JOIN_FID"))
    j = join.select(*sel)
    if not error_if_many:
        # deterministic "last match wins": keep the max by order_col (or key order)
        ocol = order_col or join_fields[0] if join_fields else "__key"
        w = Window.partitionBy("__key").orderBy(F.col(ocol).desc_nulls_last())
        j = j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return origin.join(F.broadcast(j), origin[on_field] == j["__key"], "left").drop("__key")
