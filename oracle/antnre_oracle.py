"""Single-process oracle for parity testing (SURVEY.md §0, §5.4).

`/root/reference` is empty in this sandbox (no network), so the parity
criterion "P/R >= 0.95 vs reference AntNRE emitted triples"
(BASELINE.json:2,14) is evaluated against THIS module: a deterministic
pandas+numpy implementation of the identical pipeline semantics —
same forward pass (antnre_spark.nnmodel), same hashing
(antnre_spark.hashing), same normalization/threshold/tie-break rules —
run single-process with none of Spark's batching, shuffling, or
partitioning. Parity then tests exactly what the spec means: that the
distributed run reproduces the reference model's per-sentence and
per-cluster decisions under arbitrary parallelism.

NO pyspark imports here (the two imported antnre_spark modules are
pyspark-free by contract — enforced in tests/test_oracle_parity.py).
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from antnre_spark import hashing  # noqa: E402  (pyspark-free)
from antnre_spark.nnmodel import AntNREModel  # noqa: E402  (pyspark-free)

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+")
_WS = re.compile(r"\s+")

JACCARD_TAU = hashing.TAU_LO
MAX_BUCKET = 64
PROVENANCE_CAP = 20
EXTRACT_ROLES = ("user", "assistant")


@dataclass
class OracleResult:
    documents: pd.DataFrame
    sentences: pd.DataFrame
    mentions: pd.DataFrame
    relations: pd.DataFrame
    surface_map: pd.DataFrame
    entities: pd.DataFrame
    triples: pd.DataFrame


def _normalize(surface: str) -> str:
    return _WS.sub(" ", surface.strip()).lower()


def _dedup_turns(t: pd.DataFrame) -> pd.DataFrame:
    """Latest ts wins per (conv_id, turn_idx); tie -> lexicographically
    LARGEST text (mirrors assemble.dedup_turns: ts DESC, text DESC)."""
    t = t.sort_values(
        ["conv_id", "turn_idx", "ts", "text"],
        ascending=[True, True, False, False],
        kind="mergesort",
    )
    return t.drop_duplicates(["conv_id", "turn_idx"], keep="first").reset_index(
        drop=True
    )


def _split_sentences(text: str) -> list[str]:
    return [p for p in _SENT_BOUNDARY.split(text) if p]


def _union_find(nodes: list, edges: list[tuple]) -> dict:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min label keeps the representative deterministic
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    # path-compress to final min labels
    return {n: find(n) for n in nodes}


def run_oracle(
    transcripts: pd.DataFrame,
    weights_npz: str,
    vocab_json: str,
    tau: float = JACCARD_TAU,
    max_bucket: int = MAX_BUCKET,
) -> OracleResult:
    model = AntNREModel.from_files(weights_npz, vocab_json)

    turns = _dedup_turns(transcripts)
    docs = (
        turns.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .groupby("conv_id", sort=True)
        .apply(
            lambda g: list(
                g[["turn_idx", "role", "text", "tool", "ts"]].itertuples(index=False)
            ),
            include_groups=False,
        )
        .rename("turns")
        .reset_index()
    )
    docs["n_turns"] = docs["turns"].map(len)

    extractable = turns[
        turns["role"].isin(EXTRACT_ROLES)
        & turns["text"].notna()
        & (turns["text"].str.len() > 0)
    ]

    sent_rows = []
    for row in extractable.itertuples(index=False):
        for si, sent in enumerate(_split_sentences(row.text)):
            tokens = _WS.split(sent.strip())
            sent_rows.append((row.conv_id, row.turn_idx, si, tokens))
    sentences = pd.DataFrame(
        sent_rows, columns=["conv_id", "turn_idx", "sent_idx", "tokens"]
    )

    # ---- extraction (identical forward pass, single batch stream) -------
    results = model.extract(list(sentences["tokens"]))
    m_rows, r_rows = [], []
    for (conv, turn, sent, tokens), (mentions, relations) in zip(
        sentences.itertuples(index=False), results
    ):
        for m in mentions:
            m_rows.append(
                (
                    conv, turn, sent,
                    f"{conv}:{turn}:{sent}:{m.begin}-{m.end}",
                    m.begin, m.end, m.ent_type,
                    " ".join(tokens[m.begin : m.end]), m.conf,
                )
            )
        for r in relations:
            sm, om = mentions[r.subj], mentions[r.obj]
            r_rows.append(
                (
                    conv, turn, sent,
                    f"{conv}:{turn}:{sent}:{sm.begin}-{sm.end}",
                    f"{conv}:{turn}:{sent}:{om.begin}-{om.end}",
                    r.pred, r.conf,
                )
            )
    mentions_df = pd.DataFrame(
        m_rows,
        columns=[
            "conv_id", "turn_idx", "sent_idx", "mention_id",
            "begin", "end", "ent_type", "surface", "conf",
        ],
    )
    relations_df = pd.DataFrame(
        r_rows,
        columns=[
            "conv_id", "turn_idx", "sent_idx",
            "subj_mention_id", "obj_mention_id", "pred", "conf",
        ],
    )

    # ---- linking (same MinHash/LSH/CC math as antnre_spark.link) --------
    mm = mentions_df.copy()
    mm["norm"] = mm["surface"].map(_normalize)
    per_raw = (
        mm.groupby(["ent_type", "norm", "surface"], sort=True)
        .size()
        .rename("n_raw")
        .reset_index()
    )
    per_raw = per_raw.sort_values(
        ["ent_type", "norm", "n_raw", "surface"],
        ascending=[True, True, False, True],
        kind="mergesort",
    )
    surfaces = (
        per_raw.groupby(["ent_type", "norm"], sort=True)
        .agg(n_mentions=("n_raw", "sum"), top_surface=("surface", "first"))
        .reset_index()
    )

    grams: dict[tuple, np.ndarray] = {}
    band_buckets: dict[tuple, list[str]] = {}
    for row in surfaces.itertuples(index=False):
        codes = hashing.gram_codes(row.norm)
        grams[(row.ent_type, row.norm)] = codes
        for band in hashing.band_keys(hashing.minhash_signature(codes)):
            band_buckets.setdefault((row.ent_type, band), []).append(row.norm)

    pair_set = set()
    for (ent_type, _band), members in band_buckets.items():
        if len(members) > max_bucket:
            continue  # size-capped bucket, dropped (link.py rule)
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pair_set.add((ent_type, ms[i], ms[j]))
    def _verified(ent_type: str, a: str, b: str) -> bool:
        j = hashing.jaccard(grams[(ent_type, a)], grams[(ent_type, b)])
        if j < tau:
            return False
        return j >= hashing.TAU_HI or hashing.levenshtein(a, b) <= hashing.LEV_MAX

    edges = [
        (ent_type, a, b)
        for (ent_type, a, b) in sorted(pair_set)
        if _verified(ent_type, a, b)
    ]

    comp_map = {}
    for ent_type in sorted(surfaces["ent_type"].unique()):
        nodes = sorted(
            surfaces.loc[surfaces["ent_type"] == ent_type, "norm"].tolist()
        )
        e = [(a, b) for (t, a, b) in edges if t == ent_type]
        for n, c in _union_find(nodes, e).items():
            comp_map[(ent_type, n)] = c

    surfaces["component"] = [
        comp_map[(r.ent_type, r.norm)] for r in surfaces.itertuples(index=False)
    ]
    canon = (
        surfaces.sort_values(
            ["ent_type", "component", "n_mentions", "top_surface", "norm"],
            ascending=[True, True, False, True, True],
            kind="mergesort",
        )
        .groupby(["ent_type", "component"], sort=True)
        .agg(canonical=("top_surface", "first"))
        .reset_index()
    )
    surface_map = surfaces.merge(canon, on=["ent_type", "component"])
    surface_map["entity_id"] = (
        surface_map["ent_type"] + ":" + surface_map["component"]
    )

    entities = (
        surface_map.groupby("entity_id", sort=True)
        .agg(
            canonical=("canonical", "first"),
            ent_type=("ent_type", "first"),
            n_mentions=("n_mentions", "sum"),
            aliases=("norm", lambda s: sorted(set(s))),
        )
        .reset_index()
    )

    # ---- triples --------------------------------------------------------
    resolved = mm.merge(
        surface_map[["ent_type", "norm", "entity_id"]], on=["ent_type", "norm"]
    )
    mid2ent = dict(zip(resolved["mention_id"], resolved["entity_id"]))
    rr = relations_df.copy()
    rr["subj"] = rr["subj_mention_id"].map(mid2ent)
    rr["obj"] = rr["obj_mention_id"].map(mid2ent)
    rr = rr.dropna(subset=["subj", "obj"])

    def agg_triples(g: pd.DataFrame) -> pd.Series:
        prov = sorted(
            zip(g["conv_id"], g["turn_idx"], g["sent_idx"])
        )[:PROVENANCE_CAP]
        return pd.Series(
            {
                "conf": g["conf"].max(),
                "n_evidence": len(g),
                "provenance": [
                    {"conv_id": c, "turn_idx": int(t), "sent_idx": int(s)}
                    for c, t, s in prov
                ],
            }
        )

    if len(rr):
        triples = (
            rr.groupby(["subj", "pred", "obj"], sort=True)
            .apply(agg_triples, include_groups=False)
            .reset_index()
        )
    else:
        triples = pd.DataFrame(
            columns=["subj", "pred", "obj", "conf", "n_evidence", "provenance"]
        )

    return OracleResult(
        documents=docs,
        sentences=sentences,
        mentions=mentions_df,
        relations=relations_df,
        surface_map=surface_map,
        entities=entities,
        triples=triples,
    )


def main() -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", default="fixtures/data/transcripts.parquet")
    ap.add_argument("--weights", default="fixtures/data/weights.npz")
    ap.add_argument("--vocab", default="fixtures/data/vocab.json")
    ap.add_argument("--out", default="fixtures/data/golden")
    args = ap.parse_args()

    transcripts = pd.read_parquet(args.transcripts)
    res = run_oracle(transcripts, args.weights, args.vocab)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    res.mentions.to_parquet(out / "mentions.parquet", index=False)
    res.relations.to_parquet(out / "relations.parquet", index=False)
    res.entities.to_parquet(out / "entities.parquet", index=False)
    res.triples.to_parquet(out / "triples.parquet", index=False)
    print(
        json.dumps(
            {
                "sentences": len(res.sentences),
                "mentions": len(res.mentions),
                "relations": len(res.relations),
                "entities": len(res.entities),
                "triples": len(res.triples),
            }
        )
    )


if __name__ == "__main__":
    main()
