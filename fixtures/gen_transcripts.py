"""Deterministic synthetic transcript + gazetteer + gold-annotation generator.

Implements FIXTURES.md F1-F3: byte-reproducible (numpy.random.default_rng,
seed 42, no time/random-module APIs), no external data. Text is generated
from CoNLL04-shaped templates over a closed gazetteer so gold entity spans
and relations are known by construction (SURVEY.md §5.3).

Planted pathologies (SURVEY.md §7.3.5, FIXTURES.md F1):
  (a) one duplicated (conv_id, turn_idx) with differing ts  → C2 dedup test
  (b) one conversation with a turn_idx gap                  → ordering test
  (c) late-turn rows flagged ``snapshot=1``                 → resume test
  (d) one long "skew" conversation                          → C1 salt test
  (e) 1% of conversations get a >1h idle gap                → C3 sessions
  (f) one hub entity in ~30% of entity sentences            → link skew

Run:  python fixtures/gen_transcripts.py --out fixtures/data --size tiny
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

FIRST_NAMES = [
    "John", "Mary", "Alice", "Robert", "Linda", "James", "Patricia", "David",
    "Susan", "Michael", "Karen", "Thomas", "Nancy", "Daniel", "Laura",
]
LAST_NAMES = [
    "Smith", "Johnson", "Brown", "Garcia", "Miller", "Davis", "Wilson",
    "Moore", "Taylor", "Anderson", "Thomas", "Jackson",
]
ORG_STEMS = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Wonka",
    "Cyberdyne", "Tyrell", "Aperture", "Hooli", "Vandelay", "Dunder",
    "Sterling", "Pied Piper", "Massive Dynamic", "Oscorp", "Gringotts",
]
ORG_SUFFIXES = ["Corp", "Industries", "Systems", "Labs", "Holdings"]
LOCS = [
    "Springfield", "Riverdale", "Gotham", "Metropolis", "Star City",
    "Central City", "Smallville", "Sunnydale", "Twin Peaks", "Hill Valley",
    "Emerald City", "Atlantis", "Eldorado", "Avalon", "Shangri La",
    "Kings Landing", "Winterfell", "Rivendell", "Mordor", "Narnia",
    "Freedonia", "Latveria", "Wakanda", "Genosha", "Sokovia", "Zamunda",
    "Elbonia", "Grand Fenwick", "Ruritania", "Florin",
]
OTHER_TERMS = [
    "Quantum Engine", "Hyper Drive", "Neural Link", "Fusion Core",
    "Crystal Matrix", "Omega Protocol", "Delta Serum", "Gamma Ray",
    "Infinity Gauntlet", "Time Stone",
]

FILLER_SENTENCES = [
    "the meeting starts at noon .",
    "please review the attached report .",
    "thanks for the quick update .",
    "let me check the logs again .",
    "that sounds like a reasonable plan .",
    "the deployment finished without errors .",
    "we should revisit this next week .",
    "can you summarize the findings ?",
    "the test suite is green now .",
    "i will open a ticket for this .",
]

# (template tokens, [(slot_idx_subj, slot_idx_obj, pred)]) — slots are <Type>
TEMPLATES = [
    ("<Peop> works for <Org> .", [(0, 1, "Work_For")]),
    ("<Peop> lives in <Loc> .", [(0, 1, "Live_In")]),
    ("<Loc> is located in <Loc> .", [(0, 1, "Located_In")]),
    ("<Org> is based in <Loc> .", [(0, 1, "OrgBased_In")]),
    ("<Peop> killed <Peop> in <Loc> .", [(0, 1, "Kill"), (0, 2, "Live_In")]),
    ("<Peop> from <Org> visited <Loc> .", [(0, 1, "Work_For")]),
    ("<Org> opened an office in <Loc> .", [(0, 1, "OrgBased_In")]),
    ("<Peop> met <Peop> at <Org> .", [(0, 2, "Work_For"), (1, 2, "Work_For")]),
]

TOOLS = ["search", "python", "browser"]


def _typo(rng: np.random.Generator, s: str) -> str:
    """Deterministic one-char deletion (within MinHash-Jaccard reach)."""
    if len(s) < 6:
        return s
    i = int(rng.integers(1, len(s) - 2))
    return s[:i] + s[i + 1 :]


def build_gazetteer(rng: np.random.Generator) -> list[dict]:
    """~200 entities with alias clusters incl. case/abbrev/typo variants
    that linking must merge, and near-miss decoys it must NOT merge
    (FIXTURES.md F3)."""
    entities: list[dict] = []

    def add(ent_type: str, canonical: str, aliases: list[str]) -> None:
        entities.append(
            {
                "entity_id": f"{ent_type.lower()}_{len(entities):04d}",
                "ent_type": ent_type,
                "canonical": canonical,
                "aliases": sorted(set([canonical] + aliases)),
            }
        )

    for i, fn in enumerate(FIRST_NAMES):
        for j in range(4):
            ln = LAST_NAMES[(i + j * 3) % len(LAST_NAMES)]
            name = f"{fn} {ln}"
            aliases = [name.upper()]
            if j == 0:
                aliases.append(_typo(rng, name))
            add("Peop", name, aliases)

    for i, stem in enumerate(ORG_STEMS):
        for j in range(2):
            suffix = ORG_SUFFIXES[(i + j) % len(ORG_SUFFIXES)]
            name = f"{stem} {suffix}"
            abbrev = "".join(w[0] for w in name.split()).upper()
            aliases = [name.lower(), name.upper()]
            if j == 0 and len(abbrev) >= 2:
                # abbreviation alias is OUT of Jaccard reach on purpose: it
                # must be merged by the gazetteer-alias path, not string sim
                aliases.append(_typo(rng, name))
            add("Org", name, aliases)

    for i, loc in enumerate(LOCS):
        aliases = [loc.upper(), loc.lower()]
        if i % 3 == 0:
            aliases.append(_typo(rng, loc))
        add("Loc", loc, aliases)
        # near-miss decoy: shares the head token but diverges in the tail,
        # so padded char-3-gram Jaccard stays well below the linking
        # threshold (~0.33-0.43 vs tau=0.55) — linking must NOT merge it
        add("Loc", f"{loc} Falls", [])

    for term in OTHER_TERMS:
        add("Other", term, [term.lower()])

    return entities


def _pick_surface(rng: np.random.Generator, ent: dict) -> str:
    aliases = ent["aliases"]
    if rng.random() < 0.7:
        return ent["canonical"]
    return aliases[int(rng.integers(0, len(aliases)))]


def generate(
    n_conv: int = 100,
    skew_conv_turns: int = 400,
    seed: int = SEED,
) -> tuple[list[dict], list[dict], list[dict]]:
    """Return (gazetteer, transcript_rows, gold_rows)."""
    rng = np.random.default_rng(seed)
    gaz = build_gazetteer(rng)
    by_type: dict[str, list[dict]] = {}
    for e in gaz:
        by_type.setdefault(e["ent_type"], []).append(e)
    hub = by_type["Org"][0]  # hub entity: ~30% of Org slots (skew fixture)

    def fill(ent_type: str) -> tuple[str, dict]:
        pool = by_type[ent_type]
        if ent_type == "Org" and rng.random() < 0.30:
            ent = hub
        else:
            ent = pool[int(rng.integers(0, len(pool)))]
        return _pick_surface(rng, ent), ent

    rows: list[dict] = []
    gold: list[dict] = []

    def make_sentence() -> tuple[str, list[tuple], list[tuple]]:
        """Return (text, ent_spans, relations) — spans in token offsets."""
        if rng.random() < 0.35:
            text = FILLER_SENTENCES[int(rng.integers(0, len(FILLER_SENTENCES)))]
            return text, [], []
        tmpl, rels = TEMPLATES[int(rng.integers(0, len(TEMPLATES)))]
        out_tokens: list[str] = []
        spans: list[tuple] = []
        for tok in tmpl.split(" "):
            if tok.startswith("<"):
                ent_type = tok[1:-1]
                surface, _ent = fill(ent_type)
                begin = len(out_tokens)
                out_tokens.extend(surface.split(" "))
                spans.append((begin, len(out_tokens), ent_type))
            else:
                out_tokens.append(tok)
        relations = [
            (si, oi, pred) for (si, oi, pred) in rels if si < len(spans) and oi < len(spans)
        ]
        return " ".join(out_tokens), spans, relations

    conv_sizes = np.clip(
        rng.zipf(1.6, size=n_conv), 2, 40
    )  # Zipf-truncated in [2, 40] (FIXTURES.md F1)

    for ci in range(n_conv):
        conv_id = f"c{ci:06d}"
        n_turns = int(conv_sizes[ci])
        if ci == 0:
            n_turns = skew_conv_turns  # (d) planted long conversation
        conv_offset = timedelta(hours=ci % 240, seconds=int(rng.integers(0, 3600)))
        gap_turn = -1
        if ci % 100 == 7:  # (e) idle-gap conversations (~1%)
            gap_turn = n_turns // 2
        skip_turn = n_turns // 2 if ci == 3 and n_turns >= 4 else -1  # (b) gap

        extra_gap = timedelta(0)
        for ti in range(n_turns):
            if ti == skip_turn:
                continue
            if ti == gap_turn:
                extra_gap = timedelta(hours=2)
            role = "tool" if ti % 7 == 6 else ("user" if ti % 2 == 0 else "assistant")
            ts = EPOCH + conv_offset + timedelta(seconds=30 * ti) + extra_gap
            if role == "tool":
                tool = TOOLS[int(rng.integers(0, len(TOOLS)))]
                rows.append(
                    dict(conv_id=conv_id, turn_idx=ti, role=role,
                         text=json.dumps({"status": "ok", "tool": tool}),
                         tool=tool, ts=ts, snapshot=0)
                )
                continue
            n_sents = int(rng.integers(1, 4))
            sent_texts: list[str] = []
            for si in range(n_sents):
                text, spans, rels = make_sentence()
                sent_texts.append(text)
                gold.append(
                    dict(
                        conv_id=conv_id,
                        turn_idx=ti,
                        sent_idx=si,
                        tokens=text.split(" "),
                        ent_spans=[
                            {"begin": b, "end": e, "ent_type": t} for b, e, t in spans
                        ],
                        relations=[
                            {"subj": s, "obj": o, "pred": p} for s, o, p in rels
                        ],
                    )
                )
            rows.append(
                dict(conv_id=conv_id, turn_idx=ti, role=role,
                     text=" ".join(sent_texts), tool=None, ts=ts, snapshot=0)
            )

    # (a) duplicated (conv_id, turn_idx) with later ts — dedup keeps latest.
    # The duplicate's text is a filler (no entities) so gold is unaffected
    # only if dedup works; gold rows for the ORIGINAL are replaced below.
    dup_src = next(r for r in rows if r["conv_id"] == "c000001" and r["role"] != "tool")
    dup = dict(dup_src)
    dup["text"] = FILLER_SENTENCES[0]
    dup["ts"] = dup_src["ts"] + timedelta(seconds=5)
    rows.append(dup)
    gold = [
        g
        for g in gold
        if not (g["conv_id"] == dup["conv_id"] and g["turn_idx"] == dup["turn_idx"])
    ]
    gold.append(
        dict(conv_id=dup["conv_id"], turn_idx=dup["turn_idx"], sent_idx=0,
             tokens=dup["text"].split(" "), ent_spans=[], relations=[])
    )

    # (c) late-turn rows in a second snapshot: last conversation gets 2 extra
    # turns marked snapshot=1 (written separately by write_dataset)
    late_conv = f"c{n_conv - 1:06d}"
    max_ti = max(r["turn_idx"] for r in rows if r["conv_id"] == late_conv)
    base_ts = max(r["ts"] for r in rows if r["conv_id"] == late_conv)
    for k in range(1, 3):
        text, spans, rels = make_sentence(), None, None
        rows.append(
            dict(conv_id=late_conv, turn_idx=max_ti + k, role="user",
                 text=text[0], tool=None, ts=base_ts + timedelta(seconds=30 * k),
                 snapshot=1)
        )
        gold.append(
            dict(conv_id=late_conv, turn_idx=max_ti + k, sent_idx=0,
                 tokens=text[0].split(" "),
                 ent_spans=[
                     {"begin": b, "end": e, "ent_type": t} for b, e, t in text[1]
                 ],
                 relations=[
                     {"subj": s, "obj": o, "pred": p} for s, o, p in text[2]])
        )

    return gaz, rows, gold


def _transcripts_table(rows: list[dict]) -> pa.Table:
    rows = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"], r["ts"].isoformat()))
    return pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "tool": pa.array([r["tool"] for r in rows], pa.string()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us", tz="UTC")),
        }
    )


def _gold_table(gold: list[dict]) -> pa.Table:
    gold = sorted(gold, key=lambda g: (g["conv_id"], g["turn_idx"], g["sent_idx"]))
    span_t = pa.struct([("begin", pa.int32()), ("end", pa.int32()), ("ent_type", pa.string())])
    rel_t = pa.struct([("subj", pa.int32()), ("obj", pa.int32()), ("pred", pa.string())])
    return pa.table(
        {
            "conv_id": pa.array([g["conv_id"] for g in gold], pa.string()),
            "turn_idx": pa.array([g["turn_idx"] for g in gold], pa.int32()),
            "sent_idx": pa.array([g["sent_idx"] for g in gold], pa.int32()),
            "tokens": pa.array([g["tokens"] for g in gold], pa.list_(pa.string())),
            "ent_spans": pa.array([g["ent_spans"] for g in gold], pa.list_(span_t)),
            "relations": pa.array([g["relations"] for g in gold], pa.list_(rel_t)),
        }
    )


def write_dataset(out_dir: str, size: str = "tiny", seed: int = SEED) -> dict:
    sizes = {"tiny": (100, 400), "small": (2000, 2000), "bench": (5000, 5000)}
    n_conv, skew_turns = sizes[size]
    gaz, rows, gold = generate(n_conv=n_conv, skew_conv_turns=skew_turns, seed=seed)
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "gazetteer.json"), "w") as f:
        json.dump(gaz, f, indent=0, sort_keys=True)

    snap0 = [r for r in rows if r["snapshot"] == 0]
    snap1 = [r for r in rows if r["snapshot"] == 1]
    pq.write_table(_transcripts_table(snap0), os.path.join(out_dir, "transcripts.parquet"))
    pq.write_table(
        _transcripts_table(snap1), os.path.join(out_dir, "transcripts_late.parquet")
    )
    pq.write_table(_gold_table(gold), os.path.join(out_dir, "gold_annotations.parquet"))
    return {
        "n_conv": n_conv,
        "n_turns_snap0": len(snap0),
        "n_turns_snap1": len(snap1),
        "n_gold_sentences": len(gold),
        "n_entities": len(gaz),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixtures/data")
    ap.add_argument("--size", default="tiny", choices=["tiny", "small", "bench"])
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    info = write_dataset(args.out, args.size, args.seed)
    print(json.dumps(info))
