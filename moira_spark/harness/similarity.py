"""Similarity search over the embeddings table (task-brief tier).

- brute-force cosine top-k: the exactness baseline, SQL-checkable;
- random-hyperplane LSH ANN: the scale path (bucketed candidate join),
  rows-only check (banded hashing is not reasonably SQL-expressible).

Float discipline: both engines compute cosine in float64 over the same
element order (arrays cast to double before any arithmetic), ranks are taken
on the ROUNDED score with vec_id tiebreaks, so results are deterministic and
identical across engines.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from moira_spark.harness import load, register

_N_QUERIES = 10
_TOP_K = 5


def _dbl(col):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register(
    "embedding_cosine_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < {_N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(
               LIST_DOT_PRODUCT(q.qe, e.embedding::DOUBLE[])
               / (SQRT(LIST_DOT_PRODUCT(q.qe, q.qe))
                  * SQRT(LIST_DOT_PRODUCT(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))),
               6) AS cos_sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {_TOP_K}
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set over all vectors.

    At 100 TB this is the verification baseline; the production path is the
    LSH variant below.  The query side is tiny -> broadcast hash join, no
    shuffle of the big side.
    """
    e = load(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), _dbl("embedding").alias("qe"))
    )
    base = e.select(F.col("vec_id").alias("neighbor_id"), _dbl("embedding").alias("ne"))
    j = base.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("qe"), F.col("ne")) / (
        F.sqrt(_dot(F.col("qe"), F.col("qe")))
        * F.sqrt(_dot(F.col("ne"), F.col("ne")))
    )
    scored = j.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


_LSH_PLANES = 12  # 12-bit signatures -> 4096 buckets


def _hyperplanes(dim: int = 64, n: int = _LSH_PLANES) -> np.ndarray:
    rng = np.random.RandomState(2718)
    return rng.standard_normal((n, dim))


@register("embedding_ann_lsh", None)  # banded hashing: rows-only check
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket equi-join instead of cross join.

    sig(v) = bits of sign(P @ v) for seeded hyperplanes P.  Neighbors are
    only scored within the query's bucket, so work scales with bucket
    occupancy, not with the corpus.  Recall is traded for scale — this is
    the 100 TB path; the brute-force query above is the baseline it is
    measured against.
    """
    e = load(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    plane_arrays = [F.array(*[F.lit(float(x)) for x in row]) for row in planes]
    emb = _dbl("embedding")
    sig = sum(
        [
            F.when(_dot(emb, plane_arrays[i]) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(_LSH_PLANES)
        ],
        F.lit(0),
    ).alias("bucket")
    signed = e.select(F.col("vec_id"), emb.alias("v"), sig)
    q = (
        signed.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qe"),
            F.col("bucket").alias("qbucket"),
        )
    )
    cand = signed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot(F.col("qe"), F.col("v")) / (
        F.sqrt(_dot(F.col("qe"), F.col("qe"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register("embedding_ann_recall", None)
def embedding_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the LSH ANN path against the brute-force truth.

    At 100x scale recall is the whole point of the LSH trade: the bucketed
    join does a fraction of the work of the cross join, and this query
    quantifies what that costs in neighbor quality.  One row per query id
    (n_true / n_hit / recall) plus one 'ALL' summary row with the macro
    recall — the VALUES regress if either path breaks, not just row counts.
    """
    truth = embedding_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("true_neighbor")
    )
    approx = embedding_ann_lsh(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ann_neighbor")
    )
    hits = truth.join(
        approx,
        (truth["query_id"] == approx["query_id"])
        & (F.col("true_neighbor") == F.col("ann_neighbor")),
        "left",
    ).select(
        truth["query_id"].alias("qid"),
        F.col("ann_neighbor").isNotNull().alias("hit"),
    )
    per_query = hits.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("n_hit"),
    )
    per_query = per_query.select(
        F.col("qid").cast("string").alias("query_id"),
        "n_true",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_true"), 6).alias(
            "recall_at_k"
        ),
    )
    summary = per_query.agg(
        F.sum("n_true").alias("n_true"),
        F.sum("n_hit").alias("n_hit"),
        F.round(F.avg("recall_at_k"), 6).alias("recall_at_k"),
    ).select(F.lit("ALL").alias("query_id"), "n_true", "n_hit", "recall_at_k")
    return per_query.unionAll(summary)


@register(
    "embedding_knn_label",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS true_label, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
      SELECT q.query_id, q.true_label, e.label,
             ROUND(
               LIST_DOT_PRODUCT(q.qe, e.embedding::DOUBLE[])
               / (SQRT(LIST_DOT_PRODUCT(q.qe, q.qe))
                  * SQRT(LIST_DOT_PRODUCT(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))),
               6) AS cos_sim,
             e.vec_id AS neighbor_id
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.query_id
    ),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 10
    ),
    votes AS (
      SELECT query_id, true_label, label, COUNT(*) AS votes
      FROM topk GROUP BY query_id, true_label, label
    )
    SELECT query_id, true_label, label AS knn_label, votes
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, label) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
)
def embedding_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-label vote (k=10) over rounded cosine, deterministic
    ties (votes desc, smallest label)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        _dbl("embedding").alias("qe"),
    )
    base = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("label"),
        _dbl("embedding").alias("ne"),
    )
    j = base.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("qe"), F.col("ne")) / (
        F.sqrt(_dot(F.col("qe"), F.col("qe")))
        * F.sqrt(_dot(F.col("ne"), F.col("ne")))
    )
    scored = j.select(
        "query_id", "true_label", "label", "neighbor_id",
        F.round(cos, 6).alias("cos_sim"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    topk = scored.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= 10)
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("label").alias("knn_label"), "votes")
    )


@register(
    "embedding_label_centroids",
    """
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND(embedding[1] * 100000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 100000, 6) AS centroid_dim0
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label first-dim centroid via integerized sums (order-independent)."""
    e = load(spark, sf_dir, "embeddings")
    d0 = F.round(F.element_at(F.col("embedding"), 1).cast("double") * 100000).cast(
        "bigint"
    )
    return (
        e.withColumn("d0m", d0)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum("d0m").cast("double") / F.count(F.lit(1)) / 100000, 6
            ).alias("centroid_dim0"),
        )
    )
