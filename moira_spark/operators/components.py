"""Connected components over candidate-pair edges (dedup cluster closure).

Near-dup pair generators (Jaccard join, MinHash/SimHash banding,
embedding LSH) emit PAIRS; an actual dedup pass needs CLUSTERS — if A~B
and B~C, keeping "one of each pair" would keep two of {A,B,C}.  This
operator closes pairs into components with iterative min-label
propagation expressed entirely in DataFrame ops:

    comp(v) <- min(comp(v), min over neighbors u of comp(u))

repeated to fixpoint.  Rounds needed = graph diameter; near-dup clusters
are dense (pair generators emit most intra-cluster edges), so 1-3 rounds
in practice.  The driver-side loop touches only one scalar aggregate per
round (the changed-label count) — no row data ever reaches the driver.

At 10^12-edge scale, swap the propagation step for the alternating
large-star/small-star rounds of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC 2014) — O(log n) rounds independent of
diameter, same per-round shape (self-join + min-agg).  The interface is
the same; propagation is used here because planted-cluster diameters are
tiny and every round is two shuffles on (id) keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(src, dst) undirected edges -> (id, comp) with comp = min id reachable.

    The returned frame is persisted (its lineage spans every propagation
    round; recomputing it would re-run the whole iteration) — the caller
    owns releasing it via .unpersist() / spark.catalog.clearCache() once
    materialized, the same contract as pipeline.run_pipeline.

    Raises RuntimeError if the fixpoint is not reached in ``max_iter``
    rounds (diameter larger than expected — switch to the log-rounds
    algorithm rather than silently truncating components).
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        for _ in range(max_iter):
            nmin = (
                sym.join(labels, sym["src"] == labels["id"])
                .groupBy("dst")
                .agg(F.min("comp").alias("nmin"))
            )
            new = (
                labels.join(nmin, labels["id"] == nmin["dst"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                    ).alias("comp"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            changed = (
                new.join(labels.select("id", F.col("comp").alias("old")), "id")
                .filter(F.col("comp") != F.col("old"))
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                return labels
        labels.unpersist()  # error path: do not strand the last round's cache
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()
