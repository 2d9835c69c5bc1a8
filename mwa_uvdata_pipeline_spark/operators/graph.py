"""Connected components over candidate-pair edges (dedup clustering).

Near-dup detection (n-gram Jaccard, MinHash bands, SimHash) emits
PAIRS; actual deduplication needs CLUSTERS — if A~B and B~C, one
canonical document must represent {A, B, C} even though A and C never
matched directly. The reference has no graph operator (its dedup
surface stops at file grouping, configurators.py:227-248); this is a
north-star training-data-pipeline operator.

Implementation: iterative min-label propagation, the standard
Spark-idiomatic connected-components loop (the same fixpoint GraphX /
GraphFrames runs). Each round is one shuffle join edges⋈labels + one
min-aggregation; the loop runs until no label changes. Rounds needed =
graph diameter of the largest component; dedup-cluster graphs are
near-cliques (every member matches most others), so diameter is tiny
(2-3) regardless of corpus size. For adversarially long path graphs
the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log n) rounds with the same per-round join shape — the loop below
accepts that substitution without changing callers.

Scale posture: state is one (node, label) row per node and the edge
list — both corpus-linear, partitioned by key, no driver-side data.
The driver sees only the per-round changed-count (a 1-row action),
and ``localCheckpoint`` truncates lineage so plan size stays O(1)
across rounds instead of growing with the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
    pairs_unique: bool = False,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable
    from ``node`` over the undirected ``pairs`` edges.

    Only nodes that appear in at least one pair are returned; callers
    that need singleton rows left-join this result and coalesce to the
    node's own id.

    ``pairs_unique=True`` skips the edge dedup exchange — only for
    callers whose pairs are PROVABLY unique with src < dst (then the
    two union directions cannot collide), e.g. the exact-Jaccard pair
    output. Iteration state uses LAZY localCheckpoint: the plan is
    truncated exactly as with the old eager form (each round's plan
    reads a LogicalRDD, so analysis stays O(1) per round and a 50-round
    chain cannot blow up Catalyst), but materialization rides the
    convergence probe's own job instead of a dedicated checkpoint job
    per round — in the converged round (the common case: near-clique
    dedup graphs fixpoint in 1-2 rounds) the probe's full scan IS the
    materialization, one job instead of two (guide §1.2/§5: the
    fixpoint is driver job-latency-bound, not data-bound; Spark
    backfills any partitions a short-circuited probe skipped).
    """
    edges = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        pairs.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if not pairs_unique:
        edges = edges.distinct()
    # persist + eager count, not localCheckpoint: edges is one static
    # table (no growing lineage), the count fully materializes the
    # cache up front (a lazy persist under the short-circuiting probe
    # left PARTIAL caches — measured 2x slower), and the CacheManager's
    # plan matching lets repeated constructions in one session reuse
    # the edge build instead of re-running the upstream pair
    # computation per fixpoint. The labels chain below stays on lazy
    # localCheckpoint, where lineage DOES grow.
    edges = edges.persist()
    edges.count()
    # initial label: min(self, direct neighbors) — saves one round
    labels = (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.col("u")).alias("label"))
        .select(F.col("u").alias("node"), "label")
        .localCheckpoint(eager=False)
    )

    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least("label", "nbr_label").alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        # materializes the lazy checkpoint in the same job it probes
        # (and the upstream edges/labels checkpoints on round one)
        changed = new_labels.where("changed").limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        # silently returning a non-fixpoint would mis-assign components
        # (diameter > max_rounds, e.g. a long chain of pairwise dups);
        # the large-star/small-star variant cited above is the remedy
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            "(graph diameter exceeds max_rounds); raise max_rounds or "
            "switch to the O(log n)-round large-star/small-star algorithm"
        )

    return labels.select("node", F.col("label").alias("component"))
