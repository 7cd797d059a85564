"""Decompose the kg_stream / kg_pipeline wall gap (r6 verdict task 3:
kg_stream read 22.8s vs batch 9.87s on the same sf0.1 input — profile
where the micro-batches spend it, fix what's fixable, attribute the
rest in BASELINE.md).

Phases measured with the REAL code paths (no reimplementation):

- ``stream_only``: start_kg_stream with link_every too large to ever
  trigger phase 2 in-stream -> drain wall = phase-1 cost (per-batch
  extraction + the 4 idempotent IceLite writes).
- ``materialize``: one materialize_kg_stream call on the drained
  tables = phase-2 cost (merge surfaces -> relink -> merge partials ->
  overwrite triples/entities).
- ``bench_config``: the bench row's exact shape (link_every=2 over 2
  micro-batches + the unconditional tail materialize) for comparison;
  its wall minus (stream_only + materialize) ~ the cost of the extra
  in-stream relink.
- ``batch``: run_kg_pipeline on the same input (the reference).

Usage:  python BENCH/stream_profile.py [--sf /root/testdata/sf0.1]
        [--cpus 32] [--batches 2]
Prints one JSON line per phase plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--batches", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from antnre_spark import streaming
    from antnre_spark.icelite import IceLite
    from antnre_spark.session import get_spark

    spark = get_spark(
        "stream-profile",
        cores=args.cpus,
        shuffle_partitions=max(2 * args.cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf_name = os.path.basename(args.sf.rstrip("/"))
    input_path = f"/tmp/stream_profile_{sf_name}"
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        entrymod.synth_transcripts(spark, args.sf, mult=1).write.mode(
            "overwrite"
        ).parquet(input_path)
    from bench import KG_STREAM_DROP_FILES, prepare_kg_stream_drops

    drop_dir = prepare_kg_stream_drops(spark, input_path)
    files_per_trigger = max(1, KG_STREAM_DROP_FILES // args.batches)

    weights = os.path.join(REPO, "fixtures", "data", "weights.npz")
    vocab = os.path.join(REPO, "fixtures", "data", "vocab.json")

    # warm the JVM + python workers + broadcasts on a small batch run so
    # none of the phases below pays the cold-session tax for the others
    entrymod.run_kg_pipeline(
        spark, spark.read.parquet(input_path).limit(2000)
    ).count()

    def run_stream(link_every: int, tail_materialize: bool) -> dict:
        work = tempfile.mkdtemp(prefix="stream_profile_")
        out_root = os.path.join(work, "kg")
        t0 = time.perf_counter()
        q = streaming.start_kg_stream(
            spark, drop_dir, out_root, weights, vocab,
            os.path.join(work, "ck"),
            max_files_per_trigger=files_per_trigger,
            link_every=link_every,
        )
        q.awaitTermination()
        t_drain = time.perf_counter() - t0
        t1 = time.perf_counter()
        if tail_materialize:
            streaming.materialize_kg_stream(
                spark, streaming.kg_stream_tables(out_root)
            )
        t_mat = time.perf_counter() - t1
        triples_t = IceLite(os.path.join(out_root, "triples_stream")).load(
            spark
        )
        n = triples_t.count() if triples_t is not None else 0
        shutil.rmtree(work, ignore_errors=True)
        return {
            "drain_sec": round(t_drain, 3),
            "materialize_sec": round(t_mat, 3),
            "total_sec": round(t_drain + t_mat, 3),
            "triples": n,
        }

    never = 10**6  # link_every that never fires in-stream
    results = {}

    results["stream_only_plus_one_materialize"] = run_stream(
        link_every=never, tail_materialize=True
    )
    print(json.dumps({"phase": "stream_only_plus_one_materialize",
                      **results["stream_only_plus_one_materialize"]}),
          flush=True)

    results["bench_config"] = run_stream(link_every=2, tail_materialize=True)
    print(json.dumps({"phase": "bench_config(link_every=2 + tail)",
                      **results["bench_config"]}), flush=True)

    t0 = time.perf_counter()
    n_batch = entrymod.run_kg_pipeline(
        spark, spark.read.parquet(input_path)
    ).count()
    t_batch = round(time.perf_counter() - t0, 3)
    print(json.dumps({"phase": "batch_kg_pipeline", "total_sec": t_batch,
                      "triples": n_batch}), flush=True)

    a = results["stream_only_plus_one_materialize"]
    b = results["bench_config"]
    print(json.dumps({
        "summary": {
            "phase1_per_all_batches_sec": a["drain_sec"],
            "phase2_one_relink_sec": a["materialize_sec"],
            "bench_total_sec": b["total_sec"],
            "extra_in_stream_relink_sec": round(
                b["total_sec"] - a["total_sec"], 3
            ),
            "batch_sec": t_batch,
            "stream_over_batch": round(b["total_sec"] / t_batch, 2)
            if t_batch else None,
            "batches": args.batches,
        }
    }), flush=True)


if __name__ == "__main__":
    main()
