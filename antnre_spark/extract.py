"""E+F: fused mention + relation extraction as ONE mapInPandas stage.

The reference runs its BiLSTM-CRF mention detector and span-pair relation
classifier as consecutive stages of one forward pass per minibatch
(SURVEY.md §3.1, `[pub: entrel/]` unverified). We keep that fusion: a single
Arrow-batched mapInPandas computes per-sentence hidden states ONCE and emits
both mentions and relations as nested arrays — per-sentence hidden states
(`[T, 2h]` floats) are never shuffled between stages (SURVEY.md §2.F F2).

Scale properties:
- narrow map: inherits the input partitioning (conversation-local after C1);
  zero shuffles introduced;
- Arrow batch size is capped by spark.sql.execution.arrow.maxRecordsPerBatch
  AND re-chunked in-UDF by token budget, so one pathological batch (e.g. the
  planted 10^4-turn conversation) cannot OOM a Python worker (size-capped
  extraction batches, BASELINE.json:6 / SURVEY.md §4.3.3);
- weights travel once per executor via broadcast, unpacked once per Python
  worker process (module-level cache), not once per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from antnre_spark.nnmodel import AntNREModel
from antnre_spark.schema import EXTRACTED

# token budget per model sub-call: bounds padded-matrix memory inside the UDF
TOKEN_BUDGET = 16_384

_MODEL_CACHE: dict[str, AntNREModel] = {}


def broadcast_model(spark: SparkSession, npz_path: str, vocab_path: str):
    """A3: driver-side numpy load -> spark broadcast (never a DataFrame).
    Returns (weights_bc, vocab_bc, model_key). model_key is a content hash
    used as the per-worker model-cache key (Broadcast.id is driver-only)."""
    import hashlib
    import json

    import numpy as np

    with np.load(npz_path) as z:
        weights = {k: z[k] for k in z.files}
    with open(vocab_path) as f:
        vocab = json.load(f)
    with open(npz_path, "rb") as f:
        model_key = hashlib.sha256(f.read()).hexdigest()[:16]
    sc = spark.sparkContext
    return sc.broadcast(weights), sc.broadcast(vocab), model_key


def _model_for(weights_bc, vocab_bc, model_key: str) -> AntNREModel:
    model = _MODEL_CACHE.get(model_key)
    if model is None:
        model = AntNREModel(weights_bc.value, vocab_bc.value)
        _MODEL_CACHE.clear()  # at most one model resident per worker
        _MODEL_CACHE[model_key] = model
    return model


def _budget_bounds(sizes, budget: int) -> list[tuple[int, int]]:
    """[lo, hi) chunk bounds so each chunk's total size <= budget (one
    oversized row still forms its own chunk). THE single budget rule —
    shared by the pandas, Arrow, and fused stage bodies so they can
    never desynchronize."""
    bounds: list[tuple[int, int]] = []
    start, acc = 0, 0
    n = 0
    for i, s in enumerate(sizes):
        n = i + 1
        if acc + int(s) > budget and i > start:
            bounds.append((start, i))
            start, acc = i, 0
        acc += int(s)
    if start < n:
        bounds.append((start, n))
    return bounds


def _token_chunks(pdf: pd.DataFrame, budget: int) -> Iterator[pd.DataFrame]:
    """Re-chunk an Arrow batch so each model call sees <= budget tokens."""
    sizes = pdf["tokens"].map(len).to_numpy()
    for lo, hi in _budget_bounds(sizes, budget):
        yield pdf.iloc[lo:hi]


# Spark's `trim` removes ONLY the space character (0x20), and Java's
# regex \s is ASCII-only ([ \t\n\x0B\f\r]) — both narrower than
# python's unicode-aware str.strip()/\s. The fused path must replicate
# the JVM tokenizer EXACTLY or token indices (and therefore mention
# spans and ids) drift on inputs with tabs/newlines/NBSP at sentence
# edges — caught by the r4 self-review and pinned by
# tests/test_invariants.py::test_fused_tokenizer_matches_jvm_on_nasty_whitespace.
_JVM_WS = None  # compiled lazily (module import stays light)


def _jvm_tokens(piece: str) -> list[str]:
    """Exact python replica of F.split(F.trim(col), r"\\s+"):
    trim = strip 0x20 only; split on ASCII whitespace runs, KEEPING the
    leading/trailing empty tokens Java split(-1) produces."""
    global _JVM_WS
    if _JVM_WS is None:
        import re

        _JVM_WS = re.compile(r"[ \t\n\x0b\f\r]+")
    return _JVM_WS.split(piece.strip(" "))


def extract_sentences(
    sentences: DataFrame,
    weights_bc,
    vocab_bc,
    token_budget: int = TOKEN_BUDGET,
    model_key: str = "default",
    repartition_to: int | None = None,
    refine_types: bool = False,
    conf_mode: str = "local",
) -> DataFrame:
    """sentences(conv_id, turn_idx, sent_idx, tokens, ...) -> EXTRACTED.

    ``repartition_to``: explicit parallelism for the model stage. The
    extraction is per-sentence compute, so its ideal partition count tracks
    CORES, not data size — AQE sizes partitions for shuffle cost and will
    under-parallelize a compute stage fed by a small shuffle. Round-robin
    repartition also load-balances pathological conversations (a 10^4-turn
    conversation's sentences spread over all workers — skew cap by
    construction). At petabyte scale leave None and size the upstream
    bucketing instead: reshuffling raw text is not free.

    ``refine_types``: run the F4 GCN joint type-refinement pass inside the
    same forward call (nnmodel.refine_mention_types) — zero extra shuffles.
    """
    # prune to the four consumed columns BEFORE the repartition: char
    # offsets etc. would otherwise ride the shuffle and the Arrow hop
    sentences = sentences.select("conv_id", "turn_idx", "sent_idx", "tokens")
    if repartition_to:
        sentences = sentences.repartition(repartition_to)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _model_for(weights_bc, vocab_bc, model_key)
        for pdf in batches:
            if pdf.empty:
                continue
            for chunk in _token_chunks(pdf, token_budget):
                toks = [list(t) for t in chunk["tokens"]]
                results = model.extract(
                    toks, refine_types=refine_types, conf_mode=conf_mode
                )
                yield _results_frame(chunk, toks, results)

    return sentences.mapInPandas(run, EXTRACTED)


def extract_turns(
    turns: DataFrame,
    weights_bc,
    vocab_bc,
    token_budget: int = TOKEN_BUDGET,
    model_key: str = "default",
    repartition_to: int | None = None,
    refine_types: bool = False,
    conf_mode: str = "local",
) -> DataFrame:
    """Fused D1+D2+E+F (r3 verdict task 1): sentence segmentation +
    tokenization run INSIDE the model's mapInPandas instead of as a
    separate scalar pandas_udf stage — turn rows go through ONE Arrow
    hop, not two.

    Why this matters for N->4N scaling: the segment-then-extract chain
    serializes every turn's text across the JVM<->Python boundary twice
    (once into split_sentences_udf, once into the model UDF) and builds
    the intermediate sentence-struct arrays in between; with 4N workers
    sharing one local JVM's memory bus, those extra copies are pure
    bandwidth pressure on the stage the profile blamed (~0.5 stage
    efficiency, BENCH/BASELINE.md). Here the text crosses once and
    sentences exist only as python lists inside the worker.

    Semantics are IDENTICAL to
    ``extract_sentences(segment.segment_turns(turns))``: the same
    boundary regex (segment._SENT_BOUNDARY) and an EXACT python replica
    of the JVM tokenizer (_jvm_tokens — Spark trim strips 0x20 only and
    Java \\s is ASCII-only, both narrower than python defaults; the r4
    self-review caught the naive strip()/\\s version drifting on
    tab/NBSP-edged text). Asserted row-for-row in
    tests/test_invariants.py, including an adversarial-whitespace case.
    Output rows are per-sentence (mapInPandas may emit more rows than
    it consumes)."""
    from antnre_spark.segment import _SENT_BOUNDARY

    turns = turns.select("conv_id", "turn_idx", "text")
    if repartition_to:
        turns = turns.repartition(repartition_to)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _model_for(weights_bc, vocab_bc, model_key)
        for pdf in batches:
            if pdf.empty:
                continue
            convs: list = []
            tidxs: list = []
            sidxs: list = []
            toks_all: list = []
            for conv, tidx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if text is None:
                    continue
                sent_idx = 0
                for piece in _SENT_BOUNDARY.split(text):
                    if not piece:
                        continue
                    convs.append(conv)
                    tidxs.append(tidx)
                    sidxs.append(sent_idx)
                    toks_all.append(_jvm_tokens(piece))
                    sent_idx += 1
            # token-budget re-chunk — the SAME _budget_bounds rule as the
            # staged/Arrow paths
            bounds = _budget_bounds([len(t) for t in toks_all], token_budget)
            for lo, hi in bounds:
                toks = toks_all[lo:hi]
                if not toks:
                    continue
                results = model.extract(
                    toks, refine_types=refine_types, conf_mode=conf_mode
                )
                out_m, out_r = _result_lists(results, toks)
                yield pd.DataFrame(
                    {
                        "conv_id": convs[lo:hi],
                        "turn_idx": pd.array(tidxs[lo:hi], dtype="int32"),
                        "sent_idx": pd.array(sidxs[lo:hi], dtype="int32"),
                        "mentions": out_m,
                        "relations": out_r,
                    }
                )

    return turns.mapInPandas(run, EXTRACTED)


def extract_sentences_arrow(
    sentences: DataFrame,
    weights_bc,
    vocab_bc,
    token_budget: int = TOKEN_BUDGET,
    model_key: str = "default",
    repartition_to: int | None = None,
    refine_types: bool = False,
    conf_mode: str = "local",
) -> DataFrame:
    """mapInArrow variant of extract_sentences (SURVEY.md §2.L): consumes
    pyarrow RecordBatches directly, skipping the pandas materialization on
    BOTH sides of the Arrow hop (the model needs plain python token lists
    either way, so only the frame-building overhead differs). Output is
    row-identical to extract_sentences — asserted in tests/test_invariants.
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    sentences = sentences.select("conv_id", "turn_idx", "sent_idx", "tokens")
    if repartition_to:
        sentences = sentences.repartition(repartition_to)
    arrow_schema = to_arrow_schema(EXTRACTED)
    m_type = arrow_schema.field("mentions").type
    r_type = arrow_schema.field("relations").type

    def run(batches):
        model = _model_for(weights_bc, vocab_bc, model_key)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            toks_all = rb.column(3).to_pylist()
            # token-budget re-chunk — the shared _budget_bounds rule
            bounds = _budget_bounds([len(t) for t in toks_all], token_budget)
            for lo, hi in bounds:
                toks = toks_all[lo:hi]
                results = model.extract(
                    toks, refine_types=refine_types, conf_mode=conf_mode
                )
                out_m, out_r = _result_lists(results, toks)
                yield pa.RecordBatch.from_arrays(
                    [
                        rb.column(0).slice(lo, hi - lo),
                        rb.column(1).slice(lo, hi - lo),
                        rb.column(2).slice(lo, hi - lo),
                        pa.array(out_m, type=m_type),
                        pa.array(out_r, type=r_type),
                    ],
                    schema=arrow_schema,
                )

    return sentences.mapInArrow(run, EXTRACTED)


def extract_conversations(
    sentences: DataFrame,
    weights_bc,
    vocab_bc,
    token_budget: int = TOKEN_BUDGET,
    model_key: str = "default",
    refine_types: bool = False,
    conf_mode: str = "local",
) -> DataFrame:
    """Grouped-map variant (SURVEY.md §2.L): one model batch per
    conversation via groupBy(conv_id).applyInPandas.

    Use when downstream wants extraction co-partitioned by conv_id (e.g.
    writing conv-bucketed without a second shuffle) or when a future model
    consumes cross-sentence conversation context. Costs a shuffle on
    conv_id and inherits conversation-length skew (the mapInPandas path +
    round-robin repartition is the default for pure throughput). Output is
    identical row-for-row to extract_sentences — asserted in
    tests/test_invariants.py."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        model = _model_for(weights_bc, vocab_bc, model_key)
        out = []
        for chunk in _token_chunks(pdf, token_budget):
            toks = [list(t) for t in chunk["tokens"]]
            results = model.extract(
                    toks, refine_types=refine_types, conf_mode=conf_mode
                )
            out.append(_results_frame(chunk, toks, results))
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in EXTRACTED.fields}
            )
        )

    return sentences.groupBy("conv_id").applyInPandas(run, EXTRACTED)


def _results_frame(chunk: pd.DataFrame, toks, results) -> pd.DataFrame:
    out_m, out_r = _result_lists(results, toks)
    return pd.DataFrame(
        {
            "conv_id": chunk["conv_id"].values,
            "turn_idx": chunk["turn_idx"].values,
            "sent_idx": chunk["sent_idx"].values,
            "mentions": out_m,
            "relations": out_r,
        }
    )


def _result_lists(results, toks) -> tuple[list, list]:
    """Model output -> plain mention/relation dict lists (shared by the
    pandas and the Arrow stage bodies)."""
    out_m, out_r = [], []
    for (mentions, relations), tk in zip(results, toks):
        out_m.append(
            [
                {
                    "begin": m.begin,
                    "end": m.end,
                    "ent_type": m.ent_type,
                    "surface": " ".join(tk[m.begin : m.end]),
                    "conf": m.conf,
                }
                for m in mentions
            ]
        )
        out_r.append(
            [
                {
                    "subj_begin": mentions[r.subj].begin,
                    "subj_end": mentions[r.subj].end,
                    "subj_ent_type": mentions[r.subj].ent_type,
                    "subj_surface": " ".join(
                        tk[mentions[r.subj].begin : mentions[r.subj].end]
                    ),
                    "obj_begin": mentions[r.obj].begin,
                    "obj_end": mentions[r.obj].end,
                    "obj_ent_type": mentions[r.obj].ent_type,
                    "obj_surface": " ".join(
                        tk[mentions[r.obj].begin : mentions[r.obj].end]
                    ),
                    "pred": r.pred,
                    "conf": r.conf,
                }
                for r in relations
            ]
        )
    return out_m, out_r


def _mention_id(conv, turn, sent, begin, end):
    return F.concat_ws(
        ":", conv, turn.cast("string"), sent.cast("string"),
        F.concat_ws("-", begin.cast("string"), end.cast("string")),
    )


def explode_mentions(extracted: DataFrame) -> DataFrame:
    """EXTRACTED -> MENTIONS rows with deterministic mention_id
    ``conv:turn:sent:begin-end`` (pure function of position — no UUIDs, so
    re-extraction is idempotent for resume, SURVEY.md §7.3)."""
    m = extracted.select(
        "conv_id", "turn_idx", "sent_idx", F.explode("mentions").alias("m")
    )
    return m.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        _mention_id(
            F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx"),
            F.col("m.begin"), F.col("m.end"),
        ).alias("mention_id"),
        F.col("m.begin").alias("begin"),
        F.col("m.end").alias("end"),
        F.col("m.ent_type").alias("ent_type"),
        F.col("m.surface").alias("surface"),
        F.col("m.conf").alias("conf"),
    )


def explode_relations(extracted: DataFrame) -> DataFrame:
    """EXTRACTED -> RELATIONS rows; mention ids reconstructed from span
    offsets and argument (type, surface) carried inline (no join back to
    mentions needed — zero shuffle; triple resolution joins only the small
    distinct-surface map)."""
    r = extracted.select(
        "conv_id", "turn_idx", "sent_idx", F.explode("relations").alias("r")
    )
    return r.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        _mention_id(
            F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx"),
            F.col("r.subj_begin"), F.col("r.subj_end"),
        ).alias("subj_mention_id"),
        _mention_id(
            F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx"),
            F.col("r.obj_begin"), F.col("r.obj_end"),
        ).alias("obj_mention_id"),
        F.col("r.subj_ent_type").alias("subj_ent_type"),
        F.col("r.subj_surface").alias("subj_surface"),
        F.col("r.obj_ent_type").alias("obj_ent_type"),
        F.col("r.obj_surface").alias("obj_surface"),
        F.col("r.pred").alias("pred"),
        F.col("r.conf").alias("conf"),
    )
