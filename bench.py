"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the flagship KG pipeline (the throughput target,
BASELINE.json:2 "end-to-end turns/sec") + one representative per operator
family (assembly, agg, join, dedup, simsearch). Each timing includes plan
construction and full execution (count() materializes every stage,
including the model mapInPandas and the CC loop).

Scaling evidence (N vs 4N cores) is produced by BENCH/run_scaling.py which
invokes this file in subprocesses with SPARK_GRAFT_CPUS=8/32.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

INPUT_VERSION = 2  # bump when synth_transcripts changes

# FROZEN at round 3: the like-for-like comparison set. headline_total may
# grow as new rows are added round over round; headline_like_for_like sums
# exactly these queries so cross-round totals compare directly. Do NOT
# edit this tuple — add new queries to `headline` only.
#
# What is frozen is the set of query NAMES (product benchmarking): each
# name runs whatever that query's CURRENT production implementation is,
# so round-over-round deltas include engine improvements (e.g. r4 moved
# kg_pipeline from the staged extract path to the fused extract_turns
# path — deliberately part of the r4 like-for-like delta). The staged
# path remains separately visible as the `kg_extract` row.
LIKE_FOR_LIKE_R3 = (
    "kg_pipeline",
    "kg_extract",
    "c1_ordered_assembly",
    "h2_groupby_agg",
    "h1_join_2hop",
    "dd_exact",
    "dd_minhash_cands",
    "dd_minhash_candidates",
    "ss_topk_cosine",
    "t_quality",
)


#: kg_stream drop-dir shape shared with BENCH/stream_profile.py — the
#: profiler must decompose EXACTLY the configuration the bench row runs
#: (r7 review: a private copy could silently drift).
KG_STREAM_DROP_FILES = 4


def prepare_kg_stream_drops(spark, input_path: str) -> str:
    """Materialize the kg_stream row's drop directory (idempotent,
    untimed setup): the bench input repartitioned into
    KG_STREAM_DROP_FILES parquet files under <input>_drops4."""
    drop_dir = f"{input_path}_drops4"
    if not os.path.exists(os.path.join(drop_dir, "_SUCCESS")):
        spark.read.parquet(input_path).repartition(
            KG_STREAM_DROP_FILES
        ).write.mode("overwrite").parquet(drop_dir)
    return drop_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = sys.argv[1] if len(sys.argv) > 1 else None

    import __spark_entry__ as entrymod
    from antnre_spark.session import get_spark

    spark = get_spark(
        "antnre-bench",
        cores=cpus,
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Pre-materialize the synthetic transcript table ONCE (untimed setup):
    # a production job reads an existing Iceberg/parquet table — charging
    # input synthesis (a window over the events table) to the pipeline
    # would distort the turns/sec headline. Cached across runs per
    # (sf, mult); the warm-up pass uses a small mult=1 input.
    mult = int(os.environ.get("SPARK_GRAFT_TURNS_MULT", "1"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))

    def materialized_input(m: int) -> str:
        # INPUT_VERSION guards the cache against synth_transcripts changes
        path = f"/tmp/bench_input_v{INPUT_VERSION}_{sf_name}_m{m}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            entrymod.synth_transcripts(spark, sf_dir, mult=m).write.mode(
                "overwrite"
            ).parquet(path)
        return path

    input_path = materialized_input(mult)
    warm_path = materialized_input(1)

    def kg_pipeline_read(spark_, _sf_dir, path=input_path):
        return entrymod.run_kg_pipeline(spark_, spark_.read.parquet(path))

    def kg_extract_read(spark_, _sf_dir, path=input_path):
        """Extraction stage only (assembly -> segment -> model mapInPandas):
        the embarrassingly-parallel core, reported separately so compute
        scaling is visible apart from the gazetteer-bounded linking stage."""
        from antnre_spark import assemble, extract, segment

        w_bc, v_bc, key = extract.broadcast_model(
            spark_,
            os.path.join(REPO, "fixtures", "data", "weights.npz"),
            os.path.join(REPO, "fixtures", "data", "vocab.json"),
        )
        raw = assemble.partition_for_extraction(
            spark_.read.parquet(path),
            10 * spark_.sparkContext.defaultParallelism,
        )
        sentences = segment.segment_turns(
            assemble.filter_extractable(
                assemble.explode_documents(assemble.assemble_documents_fused(raw))
            )
        )
        return extract.explode_mentions(
            extract.extract_sentences(sentences, w_bc, v_bc, model_key=key)
        )

    def kg_extract_fused_read(spark_, _sf_dir, path=input_path):
        """Extraction with segmentation folded INTO the model UDF
        (extract.extract_turns): one Arrow hop instead of two. Compared
        against kg_extract in scaling campaigns (r3 verdict task 1)."""
        from antnre_spark import assemble, extract

        w_bc, v_bc, key = extract.broadcast_model(
            spark_,
            os.path.join(REPO, "fixtures", "data", "weights.npz"),
            os.path.join(REPO, "fixtures", "data", "vocab.json"),
        )
        raw = assemble.partition_for_extraction(
            spark_.read.parquet(path),
            10 * spark_.sparkContext.defaultParallelism,
        )
        turns = assemble.filter_extractable(
            assemble.explode_documents(assemble.assemble_documents_fused(raw))
        )
        return extract.explode_mentions(
            extract.extract_turns(turns, w_bc, v_bc, model_key=key)
        )

    def assembly_stage_read(spark_, _sf_dir, path=input_path):
        """Assembly+segment stage ISOLATED (no model): the stage the r3
        profile blamed for ~0.5 N->4N efficiency. The xxhash64-of-tokens
        groupBy forces full evaluation of the segmentation UDF output
        (a bare count would prune the tokens column)."""
        from pyspark.sql import functions as F

        from antnre_spark import assemble, segment

        raw = assemble.partition_for_extraction(
            spark_.read.parquet(path),
            10 * spark_.sparkContext.defaultParallelism,
        )
        sentences = segment.segment_turns(
            assemble.filter_extractable(
                assemble.explode_documents(assemble.assemble_documents_fused(raw))
            )
        )
        return (
            sentences.select(
                F.xxhash64(F.concat_ws(" ", "tokens")).alias("h")
            )
            .groupBy(F.pmod("h", F.lit(7)).alias("g"))
            .agg(F.count("*").alias("n"))
        )

    def jvm_control_read(spark_, _sf_dir, path=input_path):
        """Pure-JVM CONTROL stage with the same shuffle shape as kg_extract
        (one conv_id hash exchange -> fused assembly -> explode -> narrow
        per-token compute) but ZERO Python: its N-vs-4N scaling bounds what
        ANY code can achieve on this platform (single-JVM memory bus +
        hypervisor core budget), separating platform loss from the
        Python/Arrow path's own loss. Compute = 512 chained string-keyed
        xxhash64 rounds per token, sized to kg_extract's wall-time regime."""
        from pyspark.sql import functions as F

        from antnre_spark import assemble

        raw = assemble.partition_for_extraction(
            spark_.read.parquet(path),
            10 * spark_.sparkContext.defaultParallelism,
        )
        docs = assemble.assemble_documents_fused(raw)
        turns = assemble.filter_extractable(assemble.explode_documents(docs))
        toks = F.split(F.trim("text"), r"\s+")
        per_tok = F.transform(
            toks,
            lambda t: F.aggregate(
                F.sequence(F.lit(1), F.lit(512)),
                F.xxhash64(t),
                lambda acc, i: F.xxhash64(t, acc, i),
            ),
        )
        # XOR folds (no ANSI overflow) + a groupBy on the hash so the
        # count() action MUST evaluate the compute (a bare projection gets
        # column-pruned under count; a global agg's row count is known
        # without evaluating it — both measured as false 1.8s walls)
        h = F.aggregate(
            per_tok, F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)
        )
        return (
            turns.select(h.alias("h"))
            .groupBy(F.pmod("h", F.lit(7)).alias("g"))
            .agg(F.count("*").alias("n"))
        )

    def kg_stream_read(spark_, _sf_dir, path=input_path):
        """Streaming-KG throughput row (r5 verdict task 5): the full
        incremental stream — extraction + per-batch linking + triple
        materialization — over the SAME input as kg_pipeline, dropped as
        4 parquet files and consumed availableNow in 2 micro-batches
        (max_files_per_trigger=2, link_every=2 + one tail materialize —
        the amortized-merge config). Tracks the stream/batch gap
        round-over-round; r5 measured it only as BASELINE.md prose
        (2,139 turns/s cold vs ~14k batch). Fresh out/checkpoint dirs
        per run = always the cold number; runs ONCE (see heavy_once) —
        a 3-repeat median would triple the bench wall for a row whose
        point is a gap ratio, not microseconds."""
        import shutil
        import tempfile

        from antnre_spark import streaming
        from antnre_spark.icelite import IceLite

        # drop_dir prep lives in prepare_kg_stream_input (untimed setup,
        # called before the timing loop): a first-ever run would otherwise
        # charge a full input rewrite to the stream row (r6 review)
        drop_dir = f"{path}_drops4"
        work = tempfile.mkdtemp(prefix="kg_stream_bench_")
        out_root = os.path.join(work, "kg")
        q = streaming.start_kg_stream(
            spark_,
            drop_dir,
            out_root,
            os.path.join(REPO, "fixtures", "data", "weights.npz"),
            os.path.join(REPO, "fixtures", "data", "vocab.json"),
            os.path.join(work, "ck"),
            max_files_per_trigger=2,
            link_every=2,
        )
        q.awaitTermination()
        streaming.materialize_kg_stream(
            spark_, streaming.kg_stream_tables(out_root)
        )
        n_triples = (
            IceLite(os.path.join(out_root, "triples_stream")).load(spark_).count()
        )
        # the whole work dir (6 IceLite tables + checkpoint over the full
        # input) goes — leaving it leaked /tmp per bench run (r6 review);
        # a row-count-preserving range() keeps the harness's .count()
        # contract without referencing the removed files
        shutil.rmtree(work, ignore_errors=True)
        return spark_.range(n_triples)

    def prepare_kg_stream_input(path=input_path):
        prepare_kg_stream_drops(spark, path)

    def dd_minhash_cands_only(spark_, sf_dir_):
        """Candidate GENERATION only (signature UDF + band self-join).
        dd_minhash_candidates additionally carries the exact-Jaccard
        verification join that makes it oracle-checkable; reporting both
        keeps round-over-round numbers comparable like-for-like (the r2
        +112% on the combined query was the added verification, not a
        candidate-path regression)."""
        from antnre_spark.dedup import minhash_dup_candidates

        return minhash_dup_candidates(entrymod._doc(spark_, sf_dir_))

    def t_trigram_map_forced(spark_, sf_dir_):
        """Trigram LM scoring, map-literal path, FORCED via a 1-row agg:
        the t_quality row forces with count(), which prunes the scored
        column — Catalyst never computes trigram_logp there, so that row
        times the scan, not the scoring (r5 finding). This row and its
        join twin time the real thing."""
        from pyspark.sql import functions as F

        from antnre_spark.textops import with_trigram_logprob

        return with_trigram_logprob(entrymod._doc(spark_, sf_dir_)).agg(
            F.round(F.sum("trigram_logp"), 2).alias("s")
        )

    def t_trigram_join_forced(spark_, sf_dir_):
        """Broadcast-join trigram path (the r5 curation-job path),
        forced the same way — value-identical to the map path, O(1)
        lookup per gram at any table size."""
        from pyspark.sql import functions as F

        from antnre_spark.textops import with_trigram_logprob_join

        return with_trigram_logprob_join(entrymod._doc(spark_, sf_dir_)).agg(
            F.round(F.sum("trigram_logp"), 2).alias("s")
        )

    def platform_control_burn() -> float:
        """Fixed-work CPU control (r6 verdict task 7): ~2s of numpy
        matmul on a quiet box. The reading rises when the host window
        degrades (this VM's effective cores swing 6-21 over minutes —
        BENCH/BASELINE.md drift ledger), so emitting pre/mid/post
        readings makes the artifact self-annotating: a slow query row
        next to a slow control is a window, next to a quiet control is
        a regression. BLAS threading is part of the measure on purpose
        — it senses the hypervisor core grant, same as Spark does."""
        import numpy as np

        a = np.fromfunction(
            lambda i, j: ((i * 37 + j * 11) % 101) / 101.0, (1024, 1024)
        )
        t0 = time.perf_counter()
        x = a
        for _ in range(24):
            x = (x @ a) % 1.0
        assert x.shape == a.shape
        return round(time.perf_counter() - t0, 3)

    q = entrymod.queries()
    # Row ORDER (r6): the frozen like-for-like ten run FIRST and
    # contiguously, then the newer headline-only rows. This box's speed
    # windows oscillate on a ~2-5 minute scale (BENCH/BASELINE.md drift
    # ledger); running the cross-round comparison set in one ~4-minute
    # block instead of spread over the full ~7-minute set halves its
    # exposure to a mid-run window flip. Per-query timing is unchanged.
    headline = {
        "kg_pipeline": kg_pipeline_read,
        "kg_extract": kg_extract_read,
        "c1_ordered_assembly": q["c1_ordered_assembly"],
        "h2_groupby_agg": q["h2_groupby_agg"],
        "h1_join_2hop": q["h1_join_2hop"],
        "dd_exact": q["dd_exact"],
        "dd_minhash_cands": dd_minhash_cands_only,
        "dd_minhash_candidates": q["dd_minhash_candidates"],
        # ss_topk_cosine left queries() (merged into ss_ivf_topk_batch as
        # its exact-verify leg) but stays in the frozen like-for-like set,
        # so bench calls the module function directly
        "ss_topk_cosine": entrymod.q_ss_topk_cosine,
        "t_quality": q["t_quality"],
        # --- end of the frozen set ---
        # r4: the fused-segmentation production path (one Arrow hop);
        # kg_extract above keeps the staged r3 shape for like-for-like
        "kg_extract_fused": kg_extract_fused_read,
        "ss_ivf_topk_batch": q["ss_ivf_topk_batch"],
        # r5: forced-evaluation trigram rows (count() on the t_quality
        # row prunes the scored column — these two time the real cost,
        # map literal vs the curation job's broadcast-join path)
        "t_trigram_map_forced": t_trigram_map_forced,
        "t_trigram_join_forced": t_trigram_join_forced,
        # r6: the streaming-KG path over the same input (headline only,
        # NOT in the frozen like-for-like set)
        "kg_stream": kg_stream_read,
    }
    # rows that run a full multi-stage job per invocation: no warmup
    # (the cold number IS the metric), capped at 2 samples instead of
    # the median-of-3 discipline (r6 verdict task 3: one cold sample in
    # a median artifact is not a trend line; two bound the spread while
    # keeping the bench wall sane — the prepared drop dir is reused,
    # each run gets fresh out/checkpoint dirs so both samples are cold)
    heavy_once = {"kg_stream"}
    # the control stage is opt-in by name (scaling campaigns), not part of
    # the driver's default headline set
    extras = {
        "jvm_control": jvm_control_read,
        "kg_extract_fused": kg_extract_fused_read,
        "assembly_stage": assembly_stage_read,
    }
    if only:
        names = only.split(",")
        headline = {n: {**headline, **extras}[n] for n in names}

    # untimed setup for the stream row's 4-file drop directory
    if "kg_stream" in headline:
        prepare_kg_stream_input()

    # count the input turns once for the turns/sec headline metric
    n_turns = spark.read.parquet(input_path).count()

    # optional warm-up pass: measures steady-state throughput (codegen
    # compiled, python worker daemons forked, broadcasts resident) — the
    # regime a long-running 10^12-turn job actually operates in. The
    # flagship warms on the small mult=1 input (same plan shape).
    warmup = os.environ.get("SPARK_GRAFT_WARMUP", "1") == "1"
    # median-of-N repeats (r5 verdict task 1): the sandbox VM's effective
    # CPU speed drifts over minutes (burst credits; observed 5x single-run
    # blips, and BENCH_r05 read +23% uniformly vs a controlled same-tree
    # run), so a one-shot artifact cannot distinguish regression from box
    # load. The PRIMARY per-query estimator is now the MEDIAN of N runs
    # (default 3): robust to one blip in either direction, unlike min
    # (optimistic under sustained load) or a single shot (noise-dominated).
    # min-of-N is kept as `queries_min` for continuity with the r1-r5
    # best-of-2 artifacts. This changes the ESTIMATOR, not the frozen
    # like-for-like query set above — names and implementations compare
    # exactly as before.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    out_rows: dict[str, int] = {}
    control: dict[str, float] = {"pre": platform_control_burn()}
    for name, fn in headline.items():
        if warmup and name not in heavy_once:
            if name in (
                "kg_pipeline",
                "kg_extract",
                "kg_extract_fused",
                "jvm_control",
                "assembly_stage",
            ):
                fn(spark, sf_dir, path=warm_path).count()
            else:
                fn(spark, sf_dir).count()
        runs: list[float] = []
        for _ in range(min(2, repeats) if name in heavy_once else repeats):
            t0 = time.perf_counter()
            out_rows[name] = fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        srt = sorted(runs)
        timings[name] = round(srt[len(srt) // 2], 3)  # upper median
        timings_min[name] = round(srt[0], 3)
        samples[name] = [round(r, 3) for r in runs]
        if name == "t_quality":  # end of the frozen like-for-like ten
            control["mid_post_frozen"] = platform_control_burn()
    control["post"] = platform_control_burn()

    total = round(sum(timings.values()), 3)
    lfl = round(
        sum(t for n, t in timings.items() if n in LIKE_FOR_LIKE_R3), 3
    )
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "headline_like_for_like": lfl,
        "estimator": f"median_of_{repeats}",
        "queries": timings,
        "queries_min": timings_min,
        "samples": samples,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": cpus,
        "input_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["kg_pipeline"], 1)
        if "kg_pipeline" in timings
        else None,
        "stream_turns_per_sec": round(n_turns / timings["kg_stream"], 1)
        if "kg_stream" in timings
        else None,
        "platform_control": control,
        "rows": out_rows,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
