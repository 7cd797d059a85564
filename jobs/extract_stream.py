"""Streaming extraction job (SURVEY.md §2.J extension) — spark-submit entry.

spark-submit --py-files kg.zip jobs/extract_stream.py \
    --in <transcript parquet drop dir> --out <table root> --checkpoint <dir>

Watches the input directory for parquet drops, runs the same extraction
stages per micro-batch (exactly-once via checkpoint + idempotent sink),
then exits when caught up (availableNow trigger).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from antnre_spark.icelite import IceLite  # noqa: E402
from antnre_spark.session import get_spark  # noqa: E402
from antnre_spark.streaming import start_extraction_stream  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="input_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--weights", default="fixtures/data/weights.npz")
    ap.add_argument("--vocab", default="fixtures/data/vocab.json")
    ap.add_argument(
        "--link",
        action="store_true",
        help="run the FULL incremental-KG stream (r5): extraction + "
        "per-batch surface/partial merge + linking + triple "
        "materialization; triples_stream then equals the batch link_job "
        "over the same turns",
    )
    ap.add_argument(
        "--link-every",
        type=int,
        default=1,
        help="run the merge/relink phase on every K-th batch only (the "
        "amortization knob); the tail is always materialized after the "
        "stream drains",
    )
    args = ap.parse_args()

    spark = get_spark("kg_extract_stream")
    if args.link:
        from antnre_spark.streaming import (
            kg_stream_tables,
            materialize_kg_stream,
            start_kg_stream,
        )

        q = start_kg_stream(
            spark, args.input_dir, args.out, args.weights, args.vocab,
            args.checkpoint, link_every=args.link_every,
        )
        q.awaitTermination()
        # bring the serving tables current regardless of where the last
        # link_every boundary fell (idempotent)
        materialize_kg_stream(spark, kg_stream_tables(args.out))
        out = {
            "mentions": IceLite(f"{args.out}/mentions_stream").total_rows(),
            "relations": IceLite(f"{args.out}/relations_stream").total_rows(),
            "triples": IceLite(f"{args.out}/triples_stream").total_rows(),
            "entities": IceLite(f"{args.out}/entities_stream").total_rows(),
        }
        print(json.dumps(out))
        return
    q = start_extraction_stream(
        spark, args.input_dir, args.out, args.weights, args.vocab, args.checkpoint
    )
    q.awaitTermination()
    ment = IceLite(f"{args.out}/mentions_stream")
    rel = IceLite(f"{args.out}/relations_stream")
    print(
        json.dumps(
            {"mentions": ment.total_rows(), "relations": rel.total_rows()}
        )
    )


if __name__ == "__main__":
    main()
