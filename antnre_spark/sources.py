"""A2: annotated-corpus reader/writer — CoNLL04-shaped text format
(SURVEY.md §2.A A2; format per the public corpus layout, `[pub: data/]`
unverified — see SURVEY.md §0 provenance policy).

Serialization (one block per sentence, blank-line separated):

    #doc <conv_id> <turn_idx> <sent_idx>
    <idx>\t<token>\t<BIO-tag>
    ...
    #rel <subj_span_idx> <obj_span_idx> <pred>

Small-corpus semantics: annotated corpora are a few MB (CoNLL04 is ~1.4k
sentences) — the reader parses driver-side and builds a DataFrame with the
explicit gold schema; no distributed parse is warranted. For hypothetical
huge annotated corpora, the same block parser drops into
``spark.read.text`` + ``mapInPandas`` unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

GOLD_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("tokens", ArrayType(StringType(), False), False),
        StructField(
            "ent_spans",
            ArrayType(
                StructType(
                    [
                        StructField("begin", IntegerType(), False),
                        StructField("end", IntegerType(), False),
                        StructField("ent_type", StringType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
        StructField(
            "relations",
            ArrayType(
                StructType(
                    [
                        StructField("subj", IntegerType(), False),
                        StructField("obj", IntegerType(), False),
                        StructField("pred", StringType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
    ]
)


def _tags_to_spans(tags: list[str]) -> list[dict]:
    spans, start, cur = [], -1, None
    for i, tag in enumerate(tags + ["O"]):
        if tag.startswith("B-"):
            if cur is not None:
                spans.append({"begin": start, "end": i, "ent_type": cur})
            start, cur = i, tag[2:]
        elif tag.startswith("I-") and cur == tag[2:]:
            continue
        else:
            if cur is not None:
                spans.append({"begin": start, "end": i, "ent_type": cur})
            start, cur = -1, None
    return spans


def _spans_to_tags(n: int, spans: list) -> list[str]:
    tags = ["O"] * n
    for s in spans:
        tags[s["begin"]] = f"B-{s['ent_type']}"
        for i in range(s["begin"] + 1, s["end"]):
            tags[i] = f"I-{s['ent_type']}"
    return tags


def parse_conll04(text: str) -> list[dict]:
    """Parse the block format into gold-annotation rows (pure function)."""
    rows: list[dict] = []
    cur: dict | None = None
    for line in text.splitlines() + [""]:
        line = line.rstrip("\n")
        if line.startswith("#doc "):
            _, conv_id, turn_idx, sent_idx = line.split(" ")
            cur = {
                "conv_id": conv_id,
                "turn_idx": int(turn_idx),
                "sent_idx": int(sent_idx),
                "tokens": [],
                "_tags": [],
                "relations": [],
            }
        elif line.startswith("#rel ") and cur is not None:
            _, s, o, pred = line.split(" ")
            cur["relations"].append({"subj": int(s), "obj": int(o), "pred": pred})
        elif line == "":
            if cur is not None:
                cur["ent_spans"] = _tags_to_spans(cur.pop("_tags"))
                rows.append(cur)
                cur = None
        elif cur is not None:
            _idx, token, tag = line.split("\t")
            cur["tokens"].append(token)
            cur["_tags"].append(tag)
    return rows


def read_conll04(spark: SparkSession, path: str) -> DataFrame:
    with open(path) as f:
        rows = parse_conll04(f.read())
    return spark.createDataFrame(rows, GOLD_SCHEMA)


def write_conll04(gold: DataFrame, path: str) -> int:
    """Inverse: gold-annotation rows -> block text (deterministic order)."""
    rows = gold.orderBy("conv_id", "turn_idx", "sent_idx").collect()
    blocks = []
    for r in rows:
        lines = [f"#doc {r['conv_id']} {r['turn_idx']} {r['sent_idx']}"]
        tags = _spans_to_tags(len(r["tokens"]), r["ent_spans"])
        for i, (tok, tag) in enumerate(zip(r["tokens"], tags)):
            lines.append(f"{i}\t{tok}\t{tag}")
        for rel in r["relations"]:
            lines.append(f"#rel {rel['subj']} {rel['obj']} {rel['pred']}")
        blocks.append("\n".join(lines))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n\n".join(blocks) + "\n")
    return len(rows)
