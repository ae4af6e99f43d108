"""Attribute equi-join (J1) — fields.join semantics (fields.py:426-497).

Reference behavior re-expressed declaratively:
- left-outer: unmatched origin rows keep nulls (fields.py:484-485);
- ``error_if_many=True``: raise when a join key is duplicated on the join
  side (fields.py:461-462) — here a pre-join groupBy assert;
- relaxed mode: LAST match wins (the reference's dict build overwrites
  earlier keys, fields.py:455-460) — here an explicit row_number pick so the
  semantics are deterministic instead of scan-order-dependent;
- the join side's FID materializes as ``JOIN_FID`` with ``_i`` collision
  suffixes across successive joins (fields.py:470-479) — pass ``fid_col``;
- multi-field keys: ``on_field``/``to_field`` accept lists (all fields must
  match, the tuple-key generalization of the reference's single field).

Scale: the broadcast hint is SIZE-GATED (a bounded limit+count probe) — a
dimension-sized join side broadcasts, anything larger falls back to a plain
join where AQE picks shuffle-hash/sort-merge and handles skew. An
unconditional broadcast hint here would OOM the driver on a large join side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from .util import broadcastable


class ManyMatchesError(ValueError):
    pass


def _as_list(v) -> list[str]:
    return [v] if isinstance(v, str) else list(v)


def attribute_join(
    origin: DataFrame,
    join: DataFrame,
    on_field: str | list[str],
    to_field: str | list[str],
    join_fields: list[str],
    error_if_many: bool = False,
    fid_col: str | None = None,
    order_col: str | None = None,
    broadcast_limit: int = 1_000_000,
) -> DataFrame:
    """Left-outer equi-join adding `join_fields` from `join` to `origin`."""
    on, to = _as_list(on_field), _as_list(to_field)
    if len(on) != len(to):
        raise ValueError(f"key arity mismatch: {on} vs {to}")
    if error_if_many:
        dups = join.groupBy(*to).count().filter(F.col("count") > 1).limit(1).collect()
        if dups:
            key = tuple(dups[0][: len(to)])
            raise ManyMatchesError(
                f"join key {dict(zip(to, key))!r} matches multiple rows (error_if_many)"
            )
    keys = [f"__key{i}" for i in range(len(to))]
    sel = [F.col(t).alias(k) for t, k in zip(to, keys)] + [F.col(c) for c in join_fields]
    if fid_col:
        # JOIN_FID with _i collision suffixes across successive joins
        # (fields.py:470-479 naming)
        fid_name, i = "JOIN_FID", 0
        existing = set(origin.columns)
        while fid_name in existing:
            i += 1
            fid_name = f"JOIN_FID_{i}"
        sel.append(F.col(fid_col).alias(fid_name))
    j = join.select(*sel)
    # gate on the PROJECTED join side (keys + requested fields — pushdown-
    # friendly, probed BEFORE the dedup window so the probe never triggers a
    # full shuffle), by rows AND sampled bytes: a wide 1M-row dimension must
    # not broadcast (util module rationale). The dedup below only shrinks it.
    do_broadcast = broadcastable(j, broadcast_limit)
    if not error_if_many:
        # deterministic "last match wins": keep the max by order_col (or key order)
        ocol = order_col or (join_fields[0] if join_fields else keys[0])
        w = Window.partitionBy(*keys).orderBy(F.col(ocol).desc_nulls_last())
        j = j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if do_broadcast:
        j = F.broadcast(j)
    cond = reduce(
        lambda a, b: a & b, [origin[o] == j[k] for o, k in zip(on, keys)]
    )
    out = origin.join(j, cond, "left")
    for k in keys:
        out = out.drop(k)
    return out
