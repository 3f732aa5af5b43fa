"""Distributed connected components over a pair/edge table.

The missing last stage of every near-duplicate pipeline: LSH/Jaccard
verification emits PAIRS (a~b, b~c), but curation needs GROUPS — the
transitive closure {a,b,c} with one representative. The reference has no
graph stage (its dedup is a scalar watermark, /root/reference/main.py:
548-558); this is part of the beyond-the-reference training-data layer.

Algorithm: iterative min-label propagation with pointer doubling. Each
node starts labeled with its own id; every round each node takes the
min label among itself and its neighbors (one fold), then replaces its
label by its label's label (one compression self-join). The label
reach roughly doubles per round, so convergence needs ~log2(diameter)
rounds - the same asymptotics as the large-star/small-star rounds of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14), with a simpler loop body.

Scale notes (100 TB):
  - each round is the neighbor-fold shuffle (join edges->labels on the
    pre-partitioned edge key + groupBy(min)) and the compression
    self-join; all hash-partition on node id.
  - lineage is cut with localCheckpoint() each round — without it the
    plan doubles per iteration and the driver OOMs on plan analysis
    long before data is a problem.
  - convergence is read off the checkpointed label frame itself (the
    previous label rides along as `_old`), so the probe is a
    short-circuiting `limit(1).count()` scan, not a join.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 20,
    strict: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve undirected edges to (id, component) with component = min
    node id reachable. Only nodes that appear in an edge are returned
    (isolated rows are their own singleton group by definition — union
    them in at the call site if needed).

    Convergence contract: with per-round pointer doubling the label
    reach roughly doubles each round, so convergence needs about
    log2(diameter) + 2 rounds - the default max_iter=20 covers graphs
    with diameters far beyond any real near-dup corpus (~10^5 hops).
    When the loop still exhausts max_iter with labels changing, the
    result is WRONG (partially propagated), so strict=True (default)
    raises; strict=False downgrades to a warning for exploratory
    use.

    stats, if given, is filled with {"rounds": n} - the number of
    fold+double rounds actually executed, the scale-probe observable
    (SCALE.md quantifies its growth vs corpus size)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Pre-partition on the probe key so the checkpointed edge table's
    # partitioning is reusable by every round's join (no re-exchange of
    # the static side).
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(F.col("a"))
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    id_type = labels.schema["component"].dataType

    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # Carry each node's previous label through the fold ("_old" is
        # non-null exactly once per id), so convergence is read off the
        # SAME checkpointed frame with a cheap scan - no per-round
        # probe join.
        nbr_labels = sym.join(
            labels, sym["a"] == labels["id"], "inner"
        ).select(
            F.col("b").alias("id"),
            F.col("component"),
            F.lit(None).cast(id_type).alias("_old"),
        )
        folded = (
            labels.select(
                "id", "component", F.col("component").alias("_old")
            )
            .unionByName(nbr_labels)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.max("_old").alias("_old"),
            )
        )
        # Pointer doubling: replace each label by its label's label
        # (every component value is itself a node id). One extra
        # self-join per round turns rounds-needed from O(diameter)
        # into O(log diameter) - a 12-hop chain closes in 4 rounds,
        # not 12. `folded` is deliberately NOT checkpointed: its two
        # uses below are identical subplans, so ReusedExchange computes
        # the fold shuffle once inside the round's single job.
        ptr = folded.select(
            F.col("id").alias("_cid"), F.col("component").alias("_cc")
        )
        new_labels = (
            folded.join(ptr, folded["component"] == ptr["_cid"], "left")
            .select(
                folded["id"],
                F.coalesce(ptr["_cc"], folded["component"]).alias(
                    "component"
                ),
                folded["_old"],
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.where(F.col("component") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("id", "component")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # The fixpoint may have been reached exactly on the final
        # round (that round still reports changed!=0). One cheap probe
        # fold distinguishes "converged, unconfirmed" from genuinely
        # unfinished - without it, a correct result would raise.
        probe = (
            sym.join(labels, sym["a"] == labels["id"], "inner")
            .select(F.col("b").alias("id"), F.col("component"))
            .join(
                labels.select(
                    "id", F.col("component").alias("_cur")
                ),
                "id",
            )
            .where(F.col("component") < F.col("_cur"))
            .limit(1)
            .count()
        )
        converged = probe == 0
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds (with pointer doubling that bounds the "
            f"reachable diameter at ~2^{max_iter}); labels are partially "
            "propagated and component assignments are wrong. Raise "
            "max_iter."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pair table -> (doc_id, component) group assignment;
    component is the smallest doc_id in the transitive-closure group."""
    return connected_components(pairs, id_a, id_b).select(
        F.col("id").alias("doc_id"), F.col("component")
    )
