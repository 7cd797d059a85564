"""Training-data curation operators: deterministic sampling, per-source
quotas, and near-duplicate cluster resolution (keeper selection).

These close the loop the dedup operators open: `dedup.*_pairs` emit
candidate/verified duplicate PAIRS; a curation pipeline must turn those
into clusters and keep exactly one document per cluster. Everything here is
engine-portable (md5-based hashing, min-keeper rules) so each operator has
an exact DuckDB oracle twin in __spark_entry__.py.

Scale shapes:
- deterministic_sample: a pure filter on md5(key) — no shuffle, fully
  pushed into the scan stage, reproducible across runs/engines (unlike
  df.sample, whose output depends on partitioning).
- per_source_quota: one window shuffle on the source key; the quota bounds
  per-group output regardless of skew.
- dup_clusters: reuses the linking layer's connected components (hybrid
  driver-local union-find / distributed propagation), so a duplicate
  cluster of any shape resolves with the same machinery and caps as
  entity linking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from antnre_spark import link
from antnre_spark.textops import token_hash

SAMPLE_BUCKETS = 1_000_000


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate of rows, decided by md5(key) — stable across runs,
    partitionings, AND engines (md5 is identical in Spark and DuckDB; the
    driver-contract twin uses the same expression). A row is in or out of
    the sample forever: downstream incremental runs see a consistent
    corpus slice."""
    bucket = F.pmod(
        token_hash(F.col(key_col).cast("string")), F.lit(SAMPLE_BUCKETS)
    )
    return df.filter(bucket < int(rate * SAMPLE_BUCKETS))


def per_source_quota(
    df: DataFrame,
    quota: int,
    source_col: str = "source",
    order_col: str = "doc_id",
    tie_col: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` rows per source, keeping the first by a total
    deterministic order — the standard anti-domination step before corpus
    mixing (one hot source cannot flood the training mix).

    ``tie_col`` breaks ties when ``order_col`` is not unique within a
    source: row_number over a non-unique ordering would otherwise keep a
    run/partitioning-dependent subset, violating the module's determinism
    contract. Pass a unique id column; defaults keep the (order_col ==
    tie_col == doc_id) behavior, which is total on its own."""
    order = [F.col(order_col).asc()]
    if tie_col != order_col:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def dup_clusters(pairs: DataFrame) -> DataFrame:
    """Duplicate PAIRS -> clusters with a keeper per cluster.

    pairs: (id_a, id_b) long ids (any verified near-dup pair source —
    minhash/simhash/cosine). Returns one row per clustered id:
    (doc_id, cluster_id, is_keeper) where cluster_id = min doc_id in the
    connected component and is_keeper marks it. Reuses
    link.connected_components (hybrid local/distributed) via an
    order-preserving string encoding: ids are offset by 2^63 into [0,
    2^64) (decimal arithmetic — no long overflow) and zero-padded, so
    lexicographic min == numeric min for the FULL signed-long range
    (hash-derived ids like xxhash64 are signed)."""
    offset = F.lit("9223372036854775808").cast("decimal(20,0)")

    def enc(col: F.Column) -> F.Column:
        return F.lpad(
            (col.cast("decimal(20,0)") + offset).cast("string"), 20, "0"
        )

    def dec(col: F.Column) -> F.Column:
        return (col.cast("decimal(21,0)") - offset).cast("long")

    def as_node(col: str) -> DataFrame:
        return pairs.select(
            F.lit("doc").alias("ent_type"), enc(F.col(col)).alias("norm")
        )

    edges = pairs.select(
        F.lit("doc").alias("ent_type"),
        enc(F.col("id_a")).alias("norm_a"),
        enc(F.col("id_b")).alias("norm_b"),
    )
    nodes = as_node("id_a").unionByName(as_node("id_b")).distinct()
    comp = link.connected_components(edges, nodes)
    return comp.select(
        dec(F.col("norm")).alias("doc_id"),
        dec(F.col("component")).alias("cluster_id"),
        (F.col("norm") == F.col("component")).alias("is_keeper"),
    )
