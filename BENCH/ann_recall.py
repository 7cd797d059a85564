"""Measured ANN recall (no silent quality claims): recall@k of the IVF
and hyperplane-LSH batch retrieval paths against the exact per-query
top-k, on the driver testdata embeddings.

The dedup side already measures its caps (cosine_bucket_stats
dropped_frac, banded-recall test); this is the retrieval-side twin —
the number a user needs before trusting `ivf_topk_batch(nprobe=2)` on a
real corpus. Prints ONE JSON line.

Usage: python BENCH/ann_recall.py [--sf /root/testdata/sf0.1] [--k 10]
       [--qmod 20] [--clustered N]

``--clustered N`` (r4 verdict task 6) swaps the testdata embeddings for
a seeded Gaussian-mixture corpus of N vectors (64 unit-norm centers,
sigma 0.12): real embedding corpora are CLUSTERED, and partition-based
ANN (IVF) is designed for exactly that regime — the i.i.d. testdata
vectors are the worst case for it (no cluster structure to exploit, so
the true top-k spreads across many cells). Both numbers are reported in
BENCH/BASELINE.md: the clustered figure is what a user should expect on
embedding corpora, the i.i.d. figure is the honest floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def clustered_embeddings(
    spark,
    n: int,
    dim: int = 32,
    n_clusters: int = 64,
    sigma: float = 0.12,
    seed: int = 7,
):
    """Deterministic Gaussian-mixture corpus: unit-norm cluster centers,
    per-vector Gaussian noise. Built driver-side (n*dim doubles — a few
    MB at harness scale) then parallelized; the SAME generator backs the
    pytest recall floor (tests/test_dataops.py::TestIVF)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    C = rng.standard_normal((n_clusters, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    X = C[assign] + rng.standard_normal((n, dim)) * sigma
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}
    )
    return spark.createDataFrame(pdf).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--qmod", type=int, default=20, help="query_id = vec_id % qmod == 0")
    ap.add_argument(
        "--clustered",
        type=int,
        default=0,
        metavar="N",
        help="use a seeded N-vector Gaussian-mixture corpus instead of "
        "the testdata embeddings (64 clusters, sigma 0.12, dim 32)",
    )
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from antnre_spark import simsearch
    from antnre_spark.session import get_spark

    spark = get_spark("ann-recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    if args.clustered:
        e = clustered_embeddings(spark, n=args.clustered)
    else:
        e = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
    queries = e.filter(F.col("vec_id") % args.qmod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_queries = queries.count()
    dim = len(queries.first()["embedding"])

    # exact per-query top-k (ground truth): cross join + window
    q2 = queries.select(
        "query_id",
        F.col("embedding").alias("_qv"),
        simsearch._norm(F.col("embedding")).alias("_qn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("_qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in (
            q2.crossJoin(
                e.select(
                    "vec_id", "embedding",
                    simsearch._norm(F.col("embedding")).alias("_n"),
                )
            )
            .select(
                "query_id", "vec_id",
                F.round(dot / (F.col("_n") * F.col("_qn")), 6).alias("cosine"),
            )
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= args.k)
            .collect()
        )
    }

    def recall(retrieved_rows) -> float:
        got = {(r["query_id"], r["vec_id"]) for r in retrieved_rows}
        return round(len(got & exact) / len(exact), 4)

    cents = simsearch.kmeans_centroids(e)
    ivf = simsearch.ivf_index(e, cents)
    out = {
        "sf": f"clustered{args.clustered}" if args.clustered else args.sf,
        "k": args.k,
        "n_queries": n_queries,
        "n_vectors": e.count(),
        "recall": {},
    }
    for nprobe in (1, 2, 4):
        rows = simsearch.ivf_topk_batch(
            ivf, queries, cents, k=args.k, nprobe=nprobe
        ).collect()
        out["recall"][f"ivf_nprobe{nprobe}"] = recall(rows)
    lsh = simsearch.bucketed_index(e, dim=dim)
    for multi, label in ((False, "lsh_1probe"), (True, "lsh_hamming1")):
        rows = simsearch.bucketed_topk_batch(
            lsh, queries, dim=dim, k=args.k, multiprobe=multi
        ).collect()
        out["recall"][label] = recall(rows)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
