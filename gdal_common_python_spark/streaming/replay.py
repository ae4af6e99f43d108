"""Deterministic micro-batch replay staging — shared by the streaming
verification gates (`stream_dedup_replay`, `stream_cell_counts_replay`,
`stream_spatial_join_replay`).

The bridge that makes Structured Streaming operators oracle-checkable:
batch membership is a pure md5 draw on the row id (the engine-wide
resume-stable bucket convention), and micro-batch ORDER is pinned by
writing one file per batch with strictly increasing mtimes AND
lexicographic names (the file source processes oldest-first). Everything
downstream of the staging is therefore a pure function of the input
table — exactly what a DuckDB oracle can reproduce.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

# fixed epoch base: file mtime order == batch order, independent of clock
_MTIME_BASE = 1_600_000_000


def batch_ix_expr(id_col: str, n_batches: int):
    """The pure md5 bucket draw deciding a row's micro-batch (first 8 md5
    hex digits mod n) — mirrored in every replay oracle as
    ``CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % n``."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_batches
    ).cast("int")


def stage_micro_batches(
    df: DataFrame, stream_dir: str, n_batches: int, id_col: str = "doc_id"
) -> None:
    """Write `df` as `n_batches` single-file parquet micro-batches under
    `stream_dir`, order-pinned (names batch-00000.. + increasing mtimes)."""
    if n_batches < 1:
        raise ValueError("n_batches must be >= 1")
    os.makedirs(stream_dir, exist_ok=True)
    staged = df.withColumn("__b", batch_ix_expr(id_col, n_batches))
    work = stream_dir.rstrip("/") + ".staging"
    for b in range(n_batches):
        part_dir = os.path.join(work, f"part-{b}")
        staged.where(F.col("__b") == b).drop("__b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        src = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        dst = os.path.join(stream_dir, f"batch-{b:05d}.parquet")
        if src:
            shutil.move(os.path.join(part_dir, src[0]), dst)
            os.utime(dst, (_MTIME_BASE + b, _MTIME_BASE + b))
    shutil.rmtree(work, ignore_errors=True)
