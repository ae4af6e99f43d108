"""Stateful streaming dedup — first-seen document filter across micro-batches.

The batch engine dedups with hash-groupBy (operators.dedup.exact_duplicates);
on a continuously-arriving corpus that turns into a *stateful* streaming
operator: the set of already-seen fingerprints is operator state that must
survive across micro-batches and restarts. Spark's built-in
``dropDuplicates`` on a stream keeps state as an opaque blob; this
implementation uses ``applyInPandasWithState`` (Arrow-batched, grouped by
fingerprint) so the state schema is explicit and inspectable: per-group
state carries (first_doc_id, n_seen) where n_seen counts all arrivals, so
suppressed-so-far = n_seen - 1 is recoverable from the state store.

Scale shape: state is partitioned by the fingerprint hash across executors
(the groupBy shuffle IS the state partitioning), so the seen-set scales
horizontally; per-group state is a single (first_doc_id, n_seen) row.
No per-row Python — the handler receives whole Arrow batches per group.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("first_doc_id", T.StringType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def doc_fingerprint_expr(spans_col: str = "spans") -> Column:
    """Content fingerprint of the span sequence (kind, text, media_ref,
    offset) — the same canonical serialization the span-invariant gate uses,
    so 'duplicate' means byte-identical interleaved content, not just equal
    text. Pure codegen (md5 over a concat_ws/transform tree)."""
    return F.md5(
        F.concat_ws(
            "\x1f",
            F.transform(
                F.col(spans_col),
                lambda s: F.concat_ws(
                    "\x1e",
                    s["kind"],
                    F.coalesce(s["text"], F.lit("")),
                    F.coalesce(s["media_ref"], F.lit("")),
                    s["offset"].cast("string"),
                ),
            ),
        )
    )


def _first_seen(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Grouped-with-state handler: emit the group's first-ever document,
    suppress every later arrival. State rides along as (first_id, n_seen)
    where n_seen counts ALL arrivals for the fingerprint (including the one
    emitted row, so suppressed = n_seen - 1); it stays state-side as a
    lineage metric and is not part of the output schema."""
    ids: list[str] = []
    for pdf in batches:
        ids.extend(pdf["doc_id"].tolist())
    if state.exists:
        first_id, n_seen = state.get
        state.update((first_id, n_seen + len(ids)))
        return  # already emitted in an earlier micro-batch
    first_id = min(ids)  # deterministic within the first batch
    state.update((first_id, len(ids)))
    yield pd.DataFrame({"fp": [key[0]], "doc_id": [first_id]})


def stream_dedup_first_seen(docs_stream: DataFrame) -> DataFrame:
    """documents stream -> stream of (fp, doc_id) with exactly one row per
    distinct span-sequence fingerprint, ever (first occurrence wins).

    The fingerprint groupBy is the state shuffle; downstream joins against
    the full documents spine recover the surviving rows."""
    keyed = docs_stream.select(
        doc_fingerprint_expr().alias("fp"), F.col("doc_id").cast("string").alias("doc_id")
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_to_memory(spark, input_dir: str, query_name: str = "stream_dedup"):
    """File-source stream (one file per micro-batch, so cross-batch state is
    actually exercised) -> memory sink; returns the StreamingQuery."""
    from ..schemas import DOCUMENTS

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return (
        stream_dedup_first_seen(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
