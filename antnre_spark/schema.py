"""Fixed, explicit StructTypes for every pipeline table (SURVEY.md §1.2).

No schema inference anywhere in the pipeline: every read/createDataFrame in
prod paths passes one of these. The transcripts schema is authoritative from
BASELINE.json:15 (input_hint).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# INPUT — BASELINE.json:15: (conv_id:string, turn_idx:int32, role:string,
# text:string, tool:string, ts:timestamp)
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

TURN_STRUCT = StructType(
    [
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# one row per conversation; turns sorted by turn_idx ASC (the per-turn
# equality invariant surface, BASELINE.json:15)
DOCUMENTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", IntegerType(), False),
        StructField("turns", ArrayType(TURN_STRUCT, False), False),
    ]
)

SENTENCES = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("tokens", ArrayType(StringType(), False), False),
        StructField("char_begin", IntegerType(), False),
        StructField("char_end", IntegerType(), False),
    ]
)

MENTION_STRUCT = StructType(
    [
        StructField("begin", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("ent_type", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("conf", DoubleType(), False),
    ]
)

# relations carry their argument mentions' (type, surface) inline: triple
# resolution then joins the DISTINCT-SURFACE map (small, broadcastable)
# instead of the mention-sized id map — the joins that dominated triple
# materialization at scale disappear (see materialize.build_triples).
RELATION_STRUCT = StructType(
    [
        StructField("subj_begin", IntegerType(), False),
        StructField("subj_end", IntegerType(), False),
        StructField("subj_ent_type", StringType(), False),
        StructField("subj_surface", StringType(), False),
        StructField("obj_begin", IntegerType(), False),
        StructField("obj_end", IntegerType(), False),
        StructField("obj_ent_type", StringType(), False),
        StructField("obj_surface", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("conf", DoubleType(), False),
    ]
)

# output of the single fused extraction stage (E+F, SURVEY.md §2.E/§2.F):
# one row per sentence, mentions+relations as nested arrays so one numpy
# forward pass serves both and no hidden-state shuffle is needed (F2).
EXTRACTED = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("mentions", ArrayType(MENTION_STRUCT, False), False),
        StructField("relations", ArrayType(RELATION_STRUCT, False), False),
    ]
)

MENTIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("mention_id", StringType(), False),
        StructField("begin", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("ent_type", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("conf", DoubleType(), False),
    ]
)

RELATIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("subj_mention_id", StringType(), False),
        StructField("obj_mention_id", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("conf", DoubleType(), False),
    ]
)

ENTITIES = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical", StringType(), False),
        StructField("ent_type", StringType(), False),
        StructField("n_mentions", LongType(), False),
        StructField("aliases", ArrayType(StringType(), False), False),
    ]
)

PROVENANCE_STRUCT = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
    ]
)

TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("conf", DoubleType(), False),
        StructField("n_evidence", LongType(), False),
        StructField("provenance", ArrayType(PROVENANCE_STRUCT, False), False),
    ]
)

MARKERS = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_key", StringType(), False),
        StructField("snapshot_id", StringType(), False),
        StructField("input_rows", LongType(), False),
        StructField("output_rows", LongType(), False),
        StructField("triple_count", LongType(), False),
        StructField("code_hash", StringType(), False),
        StructField("model_hash", StringType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)

# CoNLL04-style inventories (SURVEY.md §5.3)
ENT_TYPES = ["Peop", "Org", "Loc", "Other"]
REL_TYPES = ["Work_For", "Live_In", "Located_In", "OrgBased_In", "Kill"]
NONE_REL = "None"
