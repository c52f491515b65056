"""Connected components over candidate-duplicate pairs — the clustering
step that completes the dedup story.

Every candidate generator in operators/dedup.py / similarity.py /
audio_fp.py emits PAIRS (doc_a, doc_b); corpus construction needs
CLUSTERS — "these 17 documents are all the same article; keep one".
Pair→cluster is transitive closure, i.e. connected components.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round it takes the min of its label and its
neighbors' labels; at convergence every node carries the smallest id of
its component (a deterministic representative). Rounds needed = graph
diameter — duplicate clusters are near-cliques (diameter ~2-3 from
banded LSH), so a handful of rounds closes real corpora. Each round is
one join + one min-aggregate, both on (node) — at 10^12 edges they
hash-partition by node and AQE handles the hot-cluster skew; labels are
localCheckpoint'd per round so the lineage (and its replay cost) stays
O(1) instead of O(rounds). For adversarial long-chain graphs swap in
large-star/small-star (Kiveris et al., SoCC 2014) — same per-round
plan shape, O(log n) rounds.

The DuckDB oracle replays the closure with a recursive CTE (symmetric
edge closure → min reachable id per node), so cluster membership —
not just pair generation — is engine-certified end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import macrobase_spark.operators.dedup  # noqa: F401  (registers the pair oracle)
from macrobase_spark.queries import ORACLES, register


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, rep) for every node appearing in `pairs`; rep = min id of
    the node's component. Driver-orchestrated min-label rounds with a
    per-round convergence check (one tiny aggregate)."""
    sym = (
        pairs.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(pairs.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
    )
    sym = sym.localCheckpoint()
    labels = sym.select("node").distinct().withColumn("rep", F.col("node"))
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("nbr"), F.col("rep").alias("nrep")),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nrep").alias("cand"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("rep"), F.coalesce(F.col("cand"), F.col("rep"))).alias(
                    "rep"
                ),
                (F.col("cand") < F.col("rep")).alias("chg"),
            )
        ).localCheckpoint()
        changed = new_labels.where(F.col("chg")).count()
        labels = new_labels.select("node", "rep")
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): the graph diameter exceeds "
            "max_iter and the returned labels split real components. Raise "
            "max_iter or use connected_components_star (O(log n) rounds).",
            stacklevel=2,
        )
    return labels


def cluster_sizes(components: DataFrame) -> DataFrame:
    """(rep, size) per component — the keep-one-representative relation."""
    return components.groupBy("rep").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )


def _register() -> None:
    # compose the oracle on top of the ALREADY-CERTIFIED minhash pair SQL,
    # so both engines cluster the exact same candidate pairs
    pairs_sql = ORACLES["dedup_minhash_lsh"]
    oracle = f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    sym AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, a FROM sym
      UNION
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS node, min(b) AS rep FROM reach GROUP BY a)
    SELECT rep, CAST(count(*) AS BIGINT) AS size
    FROM comp GROUP BY rep
    """

    @register("dedup_clusters_documents", oracle)
    def dedup_clusters_documents(spark, sf_dir: str) -> DataFrame:
        """Duplicate clusters from the MinHash-LSH candidate pairs:
        (representative doc_id, cluster size). The oracle recomputes the
        transitive closure with a recursive CTE over the same pairs."""
        from macrobase_spark.operators.dedup import minhash_lsh_candidates

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6, bands=2)
        return cluster_sizes(connected_components(pairs))


_register()


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 40,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris,
    Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected Components in
    MapReduce and Beyond", SoCC 2014): O(log n) rounds on ANY graph,
    where min-label propagation needs O(diameter). Use this for graphs
    that are not banded-LSH near-cliques (chains of pairwise near-dups,
    transitive audio fingerprint matches).

    Both star operations are pure groupBy(min)+join plans — neighborhoods
    are never collected, so hot nodes partial-aggregate map-side:

      large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u})
      small-star: every neighbor v < u (and u) links to m = min(N<(u) ∪ {u})

    Converges when the edge relation reaches a fixpoint (checked with an
    exceptAll on the shrinking edge set); at the fixpoint every non-root
    node carries exactly one edge to its component minimum."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("node"), F.least("a", "b").alias("nbr")
        )
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # large-star over the symmetric view: v > u attaches to m(u)
        sym = edges.select("node", "nbr").unionByName(
            edges.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
        )
        mins = sym.groupBy("node").agg(
            F.least(F.min("nbr"), F.first("node")).alias("m")
        )
        large = (
            sym.where(F.col("nbr") > F.col("node"))
            .join(mins, "node")
            .select(F.col("nbr").alias("node"), F.col("m").alias("nbr"))
            .where(F.col("node") != F.col("nbr"))
        )
        # small-star over smaller-pointing edges: v < u (and u) attach to m
        dirn = large.distinct().localCheckpoint()
        mins2 = dirn.groupBy("node").agg(F.min("nbr").alias("m"))
        small = (
            dirn.join(mins2, "node")
            .select(F.col("nbr").alias("node"), F.col("m").alias("nbr"))
            .unionByName(mins2.select("node", F.col("m").alias("nbr")))
            .where(F.col("node") != F.col("nbr"))
            .distinct()
            .localCheckpoint()
        )
        if (
            small.exceptAll(edges).count() == 0
            and edges.exceptAll(small).count() == 0
        ):
            edges = small
            break
        edges = small
    roots = all_nodes.join(
        edges.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("rep"))
    return edges.select("node", F.col("nbr").alias("rep")).unionByName(roots)
