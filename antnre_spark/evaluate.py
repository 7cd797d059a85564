"""CoNLL04-style micro P/R/F1 evaluation (SURVEY.md §3.4, §5.3).

Exact-match protocol preserved from the reference's eval semantics
(`[pub:]` unverified; SURVEY.md §3.1.3): an entity is correct iff span
boundaries AND type match; a relation/triple is correct iff both arguments
and the predicate match. Sets are compared distributively with
left_semi/left_anti joins — no collect of the full prediction set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def micro_prf(pred: DataFrame, gold: DataFrame, keys: Sequence[str]) -> dict:
    """Micro P/R/F1 over distinct key tuples (exact-match)."""
    keys = list(keys)
    p = pred.select(keys).distinct()
    g = gold.select(keys).distinct()
    tp = p.join(g, keys, "left_semi").count()
    fp = p.join(g, keys, "left_anti").count()
    fn = g.join(p, keys, "left_anti").count()
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (
        2 * precision * recall / (precision + recall) if precision + recall else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


MENTION_KEYS = ["conv_id", "turn_idx", "sent_idx", "begin", "end", "ent_type"]
TRIPLE_KEYS = ["subj", "pred", "obj"]


def eval_mentions(pred_mentions: DataFrame, gold_mentions: DataFrame) -> dict:
    return micro_prf(pred_mentions, gold_mentions, MENTION_KEYS)


def eval_triples(pred_triples: DataFrame, gold_triples: DataFrame) -> dict:
    return micro_prf(pred_triples, gold_triples, TRIPLE_KEYS)
