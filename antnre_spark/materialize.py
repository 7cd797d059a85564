"""H: triple materialization + aggregation (SURVEY.md §2.H; obligation
BASELINE.json:6 "(subj, pred, obj) triples materialized into partitioned
Iceberg vertex/edge tables").

Join strategy (SURVEY.md §2.I): the mention->entity surface map is distinct-
surface sized (orders of magnitude smaller than mentions), so H1 hints
broadcast when the caller says it fits; otherwise it is a sort-merge equi
join with AQE skew splitting. The hub-entity mention skew never reaches a
reducer as raw rows: resolution joins on the surface KEY (one row per hot
surface on the map side), and the triple dedup (H2) partially aggregates
map-side before the (subj, pred, obj) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from antnre_spark.link import normalize_surface

PROVENANCE_CAP = 20  # per-triple provenance kept bounded (SURVEY.md §4.3.4)


def resolve_mentions(
    mentions: DataFrame, surface_map: DataFrame, broadcast_map: bool = True
) -> DataFrame:
    """H1: mention rows -> + entity_id via (ent_type, norm) equi join."""
    m = mentions.withColumn("norm", normalize_surface(F.col("surface")))
    sm = surface_map.select("ent_type", "norm", "entity_id")
    if broadcast_map:
        sm = F.broadcast(sm)
    return m.join(sm, ["ent_type", "norm"], "inner").drop("norm")


def build_triples(
    relations: DataFrame,
    resolved_mentions: DataFrame,
    provenance_cap: int = PROVENANCE_CAP,
    broadcast_mentions: bool = False,
) -> DataFrame:
    """H1+H2: resolve both relation arguments, then dedup into TRIPLES with
    evidence counts and capped, deterministically-ordered provenance.

    The two mention joins are equi on mention_id; mention_id is prefixed by
    conv_id, so with conv_id-bucketed storage both sides co-partition and
    the joins are shuffle-free on a real cluster (SURVEY.md §4.3.6).
    """
    ment = resolved_mentions.select("mention_id", "entity_id")
    if broadcast_mentions:
        ment = F.broadcast(ment)
    subj = ment.select(
        F.col("mention_id").alias("subj_mention_id"),
        F.col("entity_id").alias("subj"),
    )
    obj = ment.select(
        F.col("mention_id").alias("obj_mention_id"),
        F.col("entity_id").alias("obj"),
    )
    resolved = (
        relations.join(subj, "subj_mention_id", "inner")
        .join(obj, "obj_mention_id", "inner")
    )
    return (
        resolved.groupBy("subj", "pred", "obj")
        .agg(
            F.max("conf").alias("conf"),
            F.count("*").alias("n_evidence"),
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("conv_id", "turn_idx", "sent_idx"))
                ),
                1,
                provenance_cap,
            ).alias("provenance"),
        )
        .select("subj", "pred", "obj", "conf", "n_evidence", "provenance")
    )


def build_vertices(triples: DataFrame, entities: DataFrame) -> DataFrame:
    """H3: vertex table = distinct entity ids referenced by any triple,
    joined with entity attributes (union + distinct set op)."""
    ids = (
        triples.select(F.col("subj").alias("entity_id"))
        .unionByName(triples.select(F.col("obj").alias("entity_id")))
        .distinct()
    )
    return ids.join(entities, "entity_id", "left")


def partition_metrics(triples: DataFrame) -> DataFrame:
    """H4: per-predicate lineage metrics — triple counts and (approximate)
    distinct entity counts. approx_count_distinct is a single-pass HLL,
    exact enough for lineage dashboards at any scale."""
    return triples.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        F.sum("n_evidence").alias("n_evidence"),
        F.approx_count_distinct("subj").alias("approx_subjects"),
        F.approx_count_distinct("obj").alias("approx_objects"),
    )


def hub_entities(triples: DataFrame, k: int = 20) -> DataFrame:
    """H5: top-k out-degree subjects (skew planning input, BASELINE.json:6
    "hub entities"). groupBy-count + orderBy-limit: Spark executes the
    limit as a TakeOrderedAndProject — no global sort materialization."""
    return (
        triples.groupBy("subj")
        .agg(F.sum("n_evidence").alias("degree"))
        .orderBy(F.col("degree").desc(), F.col("subj").asc())
        .limit(k)
    )
