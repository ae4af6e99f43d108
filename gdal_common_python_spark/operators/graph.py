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
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(id, component) for every node, component = min node id reachable
    through `edges` (columns l_id, r_id; one direction suffices — the graph
    is symmetrized here). Isolated nodes label themselves.

    Three regimes, chosen by the symmetric-edge count (one count, paid
    against the edge cache round 1 needs anyway): zero edges -> identity
    labels, no loop; <= `driver_threshold` edges -> driver union-find + one
    broadcast-mapped join (the treeReduce discipline — callers feed
    perimeter-scale graphs already reduced from area scale, so this is the
    common case and costs one collect of a few MB); larger -> the
    distributed loop below, its label table repartitioned to ~200k rows per
    partition so per-round task counts track the data.

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
    # size the loop to the graph, not to the session default: ONE bounded
    # limit-collect probe both decides the regime AND (in the common
    # perimeter-scale case) delivers the edges the driver union-find needs
    # — the r4 shape ran a full sym.count() job and then a second collect
    # of the same subplan, two jobs of pure fixed cost on small graphs
    # (~3 s of the sieve cold wall at sf0.01). CollectLimit short-circuits,
    # so on a 10^9-edge graph the probe stops after driver_threshold+1
    # rows instead of scanning everything the count used to. The label
    # table is repartitioned once (below) so every round's map side — and
    # the checkpoint file count — is proportional to the data; a 30-node
    # border graph runs 1-partition rounds, a 10^9-edge graph gets ~1
    # partition per 200k rows.
    probe = sym.limit(driver_threshold + 1).collect()
    n_edges = len(probe)
    if n_edges == 0:
        # no adjacency at all: every node is its own component; skip the
        # loop (lineage is one narrow select — no checkpoint needed)
        out = track_persisted(labels.withColumnRenamed("__nid", id_col), sym)
        out._gcp_cc_rounds = 0
        return out
    if n_edges <= driver_threshold:
        # size-gated driver finish — the treeReduce discipline: the callers
        # of this operator feed PERIMETER-scale graphs (tile-border regions,
        # chain endpoints, LSH pair survivors), already reduced from
        # area-scale by their local passes, so the common case is a graph of
        # a few MB. A driver union-find is then one collect + one broadcast
        # join — milliseconds — instead of O(log d) checkpointed rounds each
        # costing multiple distributed jobs. Graphs past the threshold
        # (collect would strain the driver) take the distributed loop below;
        # the label semantics (min id per component, python `min` ==
        # F.min for the ASCII/integer ids used here) are identical.
        parent: dict = {}

        def find(a):
            root = a
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(a, a) != root:
                parent[a], a = root, parent[a]
            return root

        for row in probe:  # the regime probe already collected every edge
            ra, rb = find(row[0]), find(row[1])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict = {}
        for node in list(parent):
            comp[node] = find(node)
        id_type = nodes.schema[id_col].dataType
        map_df = spark.createDataFrame(
            [(k, v) for k, v in comp.items() if k != v],
            T.StructType(
                [T.StructField("__mk", id_type), T.StructField("__mv", id_type)]
            ),
        )
        out = (
            labels.join(
                F.broadcast(map_df), labels["__nid"] == map_df["__mk"], "left"
            )
            .select(
                F.col("__nid").alias(id_col),
                F.coalesce(F.col("__mv"), F.col("component")).alias("component"),
            )
        )
        out = track_persisted(out, sym)
        out._gcp_cc_rounds = 1
        out._gcp_cc_driver = True
        return out
    # distributed regime: the probe only lower-bounds the edge count
    # (CollectLimit stopped at threshold+1) — take the real count here,
    # against the cache the probe started materializing
    n_edges = sym.count()
    n_nodes = labels.count()
    parts = int(max(1, max(n_nodes, 2 * n_edges) // 200_000 + 1))
    labels = labels.repartition(parts, "__nid")

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
        new_plan = (
            mn.alias("x")
            .join(hop, F.col("x.component") == F.col("__cz"), "left")
            .select(
                F.col("x.__nid").alias("__nid"),
                F.coalesce(F.col("__cc"), F.col("x.component")).alias("component"),
            )
        )
        if numeric_ids:
            # fuse the O(1)-state convergence probe into the checkpoint's
            # own job: observed metrics fire during the eager materialize,
            # so a round is ONE action, not two
            from pyspark.sql import Observation

            obs = Observation()
            new_labels = new_plan.observe(
                obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).checkpoint(eager=True)
            cur_sum = obs.get["s"]
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            # eager reliable checkpoint: materializes AND truncates lineage
            # (see module docstring); adds no persistent-RDD storage
            new_labels = new_plan.checkpoint(eager=True)
            converged = not _changed(labels, new_labels)
        labels = new_labels
        if converged:
            break
    out = track_persisted(labels.withColumnRenamed("__nid", id_col), sym)
    out._gcp_cc_rounds = rounds
    return out
