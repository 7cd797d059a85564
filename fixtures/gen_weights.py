"""Deterministic model-weight fixture generator (FIXTURES.md F4, SURVEY.md §5.4).

Builds weights.npz + vocab.json from seed 42 and the gazetteer: random
Glorot-ish inits for the BiLSTM/char-CNN/MLP, plus gazetteer-informed
emission nudges and a trigger lexicon so the tiny untrained model makes
deterministic, discriminating decisions on the fixture vocabulary (a purely
random model would emit degenerate tags). Model behavior is therefore
arbitrary-but-fixed — which is all the parity criterion needs (SURVEY.md §0).

Run:  python fixtures/gen_weights.py --gazetteer fixtures/data/gazetteer.json \
          --out fixtures/data
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from antnre_spark.nnmodel import ENT_TYPES, N_RELS, N_TAGS, REL_TYPES, TAGS  # noqa: E402,F401

SEED = 42
WORD_DIM = 32
CHAR_DIM = 8
CHAR_OUT = 16
HIDDEN = 32
REL_HIDDEN = 64

# between-span trigger lexicon -> relation type (masked by type-pair
# validity at inference time, so e.g. "in"->Live_In can't fire for Loc-Loc)
TRIGGERS = {
    "works": "Work_For",
    "for": "Work_For",
    "from": "Work_For",
    "met": "Work_For",
    "at": "Work_For",
    "lives": "Live_In",
    "in": "Live_In",
    "located": "Located_In",
    "based": "OrgBased_In",
    "office": "OrgBased_In",
    "opened": "OrgBased_In",
    "killed": "Kill",
}

TEMPLATE_WORDS = [
    "works", "for", "lives", "in", "is", "located", "based", "killed",
    "from", "visited", "opened", "an", "office", "met", "at", ".", "?",
    "the", "meeting", "starts", "noon", "please", "review", "attached",
    "report", "thanks", "quick", "update", "let", "me", "check", "logs",
    "again", "that", "sounds", "like", "a", "reasonable", "plan",
    "deployment", "finished", "without", "errors", "we", "should",
    "revisit", "this", "next", "week", "can", "you", "summarize",
    "findings", "test", "suite", "green", "now", "i", "will", "open",
    "ticket",
]


def build_vocab(gazetteer: list[dict]) -> dict[str, int]:
    tokens: set[str] = set()
    for ent in gazetteer:
        for alias in ent["aliases"]:
            tokens.update(t.lower() for t in alias.split(" "))
    tokens.update(TEMPLATE_WORDS)
    vocab = {"[PAD]": 0, "[UNK]": 1}
    for t in sorted(tokens):
        vocab[t] = len(vocab)
    return vocab


def glorot(rng: np.random.Generator, *shape: int) -> np.ndarray:
    limit = np.sqrt(6.0 / sum(shape[:2])) if len(shape) >= 2 else 0.1
    return rng.uniform(-limit, limit, size=shape).astype(np.float32)


def build_weights(gazetteer: list[dict], vocab: dict[str, int], seed: int = SEED) -> dict:
    rng = np.random.default_rng(seed)
    V = len(vocab)
    in_dim = WORD_DIM + CHAR_OUT
    w = {
        "word_emb": (rng.standard_normal((V, WORD_DIM)) * 0.1).astype(np.float32),
        "char_emb": (rng.standard_normal((96, CHAR_DIM)) * 0.1).astype(np.float32),
        "char_conv_W": glorot(rng, CHAR_OUT, 3 * CHAR_DIM),
        "char_conv_b": np.zeros(CHAR_OUT, dtype=np.float32),
        "lstm_fw_W": glorot(rng, 4 * HIDDEN, in_dim),
        "lstm_fw_U": glorot(rng, 4 * HIDDEN, HIDDEN),
        "lstm_fw_b": np.zeros(4 * HIDDEN, dtype=np.float32),
        "lstm_bw_W": glorot(rng, 4 * HIDDEN, in_dim),
        "lstm_bw_U": glorot(rng, 4 * HIDDEN, HIDDEN),
        "lstm_bw_b": np.zeros(4 * HIDDEN, dtype=np.float32),
        "emit_W": glorot(rng, 2 * HIDDEN, N_TAGS) * 0.1,
        "emit_b": np.zeros(N_TAGS, dtype=np.float32),
        "crf_transitions": (rng.standard_normal((N_TAGS, N_TAGS)) * 0.01).astype(
            np.float32
        ),
        "rel_W1": glorot(rng, 6 * HIDDEN, REL_HIDDEN) * 0.1,
        "rel_b1": np.zeros(REL_HIDDEN, dtype=np.float32),
        "rel_W2": glorot(rng, REL_HIDDEN, N_RELS) * 0.1,
        "rel_b2": np.zeros(N_RELS, dtype=np.float32),
    }

    # gazetteer emission nudges: alias token 0 -> B-type, rest -> I-type.
    # margin (5.0) dominates the random emission range (<1.0) so decisions
    # are stable across float noise and batch composition.
    gaz_emis = np.zeros((V, N_TAGS), dtype=np.float32)
    o_idx = TAGS.index("O")
    for ent in gazetteer:
        b_idx = TAGS.index(f"B-{ent['ent_type']}")
        i_idx = TAGS.index(f"I-{ent['ent_type']}")
        for alias in ent["aliases"]:
            toks = [t.lower() for t in alias.split(" ")]
            for pos, tok in enumerate(toks):
                tid = vocab.get(tok)
                if tid is None:
                    continue
                if pos == 0:
                    gaz_emis[tid, b_idx] += 5.0
                else:
                    gaz_emis[tid, i_idx] += 5.0
    for tok in TEMPLATE_WORDS:
        tid = vocab.get(tok)
        if tid is not None:
            gaz_emis[tid, o_idx] += 3.0
    gaz_emis[vocab["[UNK]"], o_idx] += 3.0
    w["gaz_emis"] = gaz_emis

    # type-pair bias: small prior toward the admissible relation (+3) and a
    # None floor (+2) — triggers (+6 each) carry the real signal.
    pair_bias = np.zeros((len(ENT_TYPES), len(ENT_TYPES), N_RELS), dtype=np.float32)
    pair_bias[:, :, 0] += 2.0
    for rel, pairs in {
        "Work_For": [("Peop", "Org")],
        "Live_In": [("Peop", "Loc")],
        "Located_In": [("Loc", "Loc")],
        "OrgBased_In": [("Org", "Loc")],
        "Kill": [("Peop", "Peop")],
    }.items():
        for s, o in pairs:
            pair_bias[ENT_TYPES.index(s), ENT_TYPES.index(o), REL_TYPES.index(rel)] += 3.0
    w["rel_pair_bias"] = pair_bias

    trig = np.zeros((V, N_RELS), dtype=np.float32)
    for tok, rel in TRIGGERS.items():
        tid = vocab.get(tok)
        if tid is not None:
            trig[tid, REL_TYPES.index(rel)] += 6.0
    w["rel_trig"] = trig

    # F4: GCN joint type-refinement weights (SURVEY.md §2.F, ACL'19-style
    # joint variant). Drawn from a SEPARATE seeded stream so every
    # pre-existing array above stays byte-identical to the pre-F4 fixture
    # (golden outputs with refinement off are unchanged). Small scale:
    # random message passing must stay below nnmodel.GCN_KEEP_MARGIN so the
    # untrained GCN nudges rather than scrambles the decoded types.
    rng2 = np.random.default_rng(seed + 1)
    w["gcn_W"] = glorot(rng2, 2 * HIDDEN, 2 * HIDDEN) * 0.1
    w["gcn_type_W"] = glorot(rng2, 2 * HIDDEN, len(ENT_TYPES)) * 0.1
    w["gcn_type_b"] = np.zeros(len(ENT_TYPES), dtype=np.float32)
    return w


def write_fixture(gazetteer_path: str, out_dir: str, seed: int = SEED) -> dict:
    with open(gazetteer_path) as f:
        gaz = json.load(f)
    vocab = build_vocab(gaz)
    weights = build_weights(gaz, vocab, seed)
    os.makedirs(out_dir, exist_ok=True)
    npz_path = os.path.join(out_dir, "weights.npz")
    vocab_path = os.path.join(out_dir, "vocab.json")
    np.savez(npz_path, **weights)
    with open(vocab_path, "w") as f:
        json.dump(vocab, f, sort_keys=True)
    hashes = {
        "model_hash": hashlib.sha256(open(npz_path, "rb").read()).hexdigest()[:16],
        "vocab_hash": hashlib.sha256(open(vocab_path, "rb").read()).hexdigest()[:16],
        "vocab_size": len(vocab),
    }
    with open(os.path.join(out_dir, "model_meta.json"), "w") as f:
        json.dump(hashes, f, indent=2, sort_keys=True)
    return hashes


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gazetteer", default="fixtures/data/gazetteer.json")
    ap.add_argument("--out", default="fixtures/data")
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    print(json.dumps(write_fixture(args.gazetteer, args.out, args.seed)))
