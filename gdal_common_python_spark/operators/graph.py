"""Distributed connected components over an edge table — the shared scale
path behind single-part dissolve (geometry adjacency) and near-duplicate
document clustering (LSH pair graph).

Iterative min-label propagation with a path-halving hop (label :=
label[label]), converging in O(log(diameter)) rounds; each round is two
joins + one aggregation on (id, label) rows. The same discipline
GraphFrames' connectedComponents applies, expressed over plain DataFrames:
every round reliable-checkpoints its label table (the update references the
previous labels more than once, so without lineage truncation the logical
plan DOUBLES per round and analysis cost goes exponential — measured:
iteration 5 took 18 s on an 8-row input).

At 100 TB: rounds shuffle on the node id (uniform by construction), the
edge table is symmetrized once and cached, and convergence is detected by
an O(1)-state aggregate probe — no driver-side collection of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["min_label_components"]


def _ensure_checkpoint_dir(spark) -> None:
    """Reliable-checkpoint dir for iterative operators, set lazily (a real
    deployment points this at durable shared storage via setCheckpointDir
    before calling; the sandbox default is a session-scoped temp dir)."""
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        import tempfile

        sc.setCheckpointDir(tempfile.mkdtemp(prefix="gcp-ckpt-"))


def min_label_components(
    spark,
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iters: int = 50,
) -> DataFrame:
    """(id, component) for every node, component = min node id reachable
    through `edges` (columns l_id, r_id; one direction suffices — the graph
    is symmetrized here). Isolated nodes label themselves.

    Labels decrease monotonically pointwise (every update is a min of
    current values; the halving hop maps L -> label[L] <= L), so for
    NUMERIC ids the label-sum strictly decreases iff ANY label changed —
    an O(1)-state aggregate convergence probe on the just-checkpointed
    table instead of a join against the previous round. decimal(38) keeps
    the sum exact at any row count (1e12 rows x int64 ids < 1e38).
    Non-numeric ids (string keys) have no sum image that preserves the
    lexicographic min order — those keep the inequality-join probe.

    The returned DataFrame is checkpoint-backed (reads replay from
    checkpoint files, never through the iteration chain); the symmetrized
    edge cache rides along as the util.release() handle, and the round
    count is exposed as `._gcp_cc_rounds` for tests/monitoring.
    """
    from .util import track_persisted

    _ensure_checkpoint_dir(spark)

    sym = edges.select(
        F.col("l_id").cast(nodes.schema[id_col].dataType),
        F.col("r_id").cast(nodes.schema[id_col].dataType),
    ).unionByName(
        edges.select(F.col("r_id").alias("l_id"), F.col("l_id").alias("r_id"))
    ).distinct()
    sym = sym.cache()
    labels = nodes.select(
        F.col(id_col).alias("__nid"), F.col(id_col).alias("component")
    )

    numeric_ids = isinstance(
        nodes.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    )

    def _label_sum(df) -> object:
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)")).alias("s")).first()["s"]

    def _changed(prev_df, new_df) -> bool:
        return (
            prev_df.alias("a")
            .join(new_df.alias("b"), "__nid")
            .filter(F.col("a.component") != F.col("b.component"))
            .limit(1)
            .count()
            > 0
        )

    prev_sum = _label_sum(labels) if numeric_ids else None
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # each node adopts the min label among itself and its neighbours
        neigh = sym.join(labels, sym["r_id"] == labels["__nid"]).select(
            F.col("l_id").alias("__nid"), "component"
        )
        mn = (
            labels.unionByName(neigh)
            .groupBy("__nid")
            .agg(F.min("component").alias("component"))
        )
        # path-halving hop: jump to the label's own label (labels are node
        # ids, so every component value is a valid key). Turns the
        # one-hop-per-round propagation (O(diameter) rounds on a chain)
        # into O(log(diameter)).
        hop = mn.select(F.col("__nid").alias("__cz"), F.col("component").alias("__cc"))
        new_labels = (
            mn.alias("x")
            .join(hop, F.col("x.component") == F.col("__cz"), "left")
            .select(
                F.col("x.__nid").alias("__nid"),
                F.coalesce(F.col("__cc"), F.col("x.component")).alias("component"),
            )
            # eager reliable checkpoint: materializes AND truncates lineage
            # (see module docstring); adds no persistent-RDD storage
            .checkpoint(eager=True)
        )
        if numeric_ids:
            cur_sum = _label_sum(new_labels)
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            converged = not _changed(labels, new_labels)
        labels = new_labels
        if converged:
            break
    out = track_persisted(labels.withColumnRenamed("__nid", id_col), sym)
    out._gcp_cc_rounds = rounds
    return out
