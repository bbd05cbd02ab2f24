"""A/B: ANN recall@k vs fraction of the corpus exact-scored.

Sweeps the LSH (tables x bucket occupancy) and IVF (nprobe) knobs on the
sf0.01 embeddings table, measuring macro recall@5 against brute-force
truth and the scan fraction = exact-scored candidates / (n_queries *
(corpus - 1)).  The trade IS the operator at 100 TB: brute force is one
row in this table (recall 1.0, fraction 1.0); every other row buys less
work with less recall.  Results feed the defaults in
harness/similarity.py and the appendix in BENCH/BASELINE.md.

Usage: python scripts/ab_ann_tradeoff.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def recall_of(truth: dict[int, set[int]], approx_rows) -> float:
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    return sum(per_q) / len(per_q)


def main() -> None:
    from moira_spark.harness import similarity as sim
    from moira_spark.session import build_session

    spark = build_session(cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    n_corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    denom = sim._N_QUERIES * (n_corpus - 1)

    truth_rows = sim.embedding_cosine_topk(spark, SF_DIR).collect()
    truth: dict[int, set[int]] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    print(f"corpus={n_corpus} queries={sim._N_QUERIES} k={sim._TOP_K}")
    print("method                        | recall@5 | cand(approx) | exact")
    print("brute force                   |    1.000 |        1.000 | 1.000")
    for n_tables, occ, nflip in (
        (8, 8, 0),
        (8, 8, 2),
        (12, 8, 2),  # the r5 default
        (16, 8, None),  # the round-6 default (flips=bits//2, rerank=n/13)
    ):
        stats: dict = {}
        rows = sim.embedding_ann_lsh(
            spark,
            SF_DIR,
            n_tables=n_tables,
            occupancy=occ,
            nflip=nflip,
            stats_out=stats,
        ).collect()
        spark.catalog.clearCache()
        frac = stats["n_candidates"] / denom
        exact_frac = stats["n_exact"] / denom
        print(
            f"lsh T={n_tables:<3} occ={occ:<3} flip={str(nflip):<4}| "
            f"{recall_of(truth, rows):8.3f} | {frac:12.3f} | {exact_frac:.3f}"
        )
    for cells_k, a, nprobe, rr in (
        (16, 1, 4, 500),
        (32, 1, 8, 500),
        (32, 2, 8, 50),   # the r5 default
        (32, 2, 8, 100),
        (64, 2, 16, 50),
        (None, 3, None, None),  # the round-6 occupancy-adaptive default
    ):
        stats = {}
        rows = sim.embedding_ann_ivf(
            spark,
            SF_DIR,
            nprobe=nprobe,
            cells_k=cells_k,
            assign=a,
            rerank=rr,
            stats_out=stats,
        ).collect()
        spark.catalog.clearCache()
        adc_frac = stats["n_candidates"] / denom
        exact_frac = stats["n_exact"] / denom
        print(
            f"ivf k={str(cells_k):<4} a={a} np={str(nprobe):<4} R={str(rr):<4}| "
            f"{recall_of(truth, rows):8.3f} | {adc_frac:12.3f} | "
            f"{exact_frac:.3f}"
        )


if __name__ == "__main__":
    main()
