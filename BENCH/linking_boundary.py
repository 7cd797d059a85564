"""Measure the hybrid-linking cutover (LOCAL_LINK_MAX_SURFACES, set from
this harness's measurements — 30k as of round 3):
time link_entities' driver-local path vs the distributed LSH/CC path on
the SAME synthetic corpus at the threshold boundary, so the cutover point
is measured rather than assumed (round-2 verdict item 6).

Surfaces are synthesized deterministically: ~n_surfaces distinct
(ent_type, norm) pairs, each observed 1-3 times (the linking stage's input
is ALWAYS distinct-surface-sized regardless of corpus size — that is the
hybrid design's premise). Both paths produce bit-identical surface maps
(asserted in tests/test_link.py); this harness only times them.

Usage: python BENCH/linking_boundary.py [--n 100000] [--repeats 2]
Appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_mentions(spark, n_surfaces: int):
    from pyspark.sql import functions as F

    # 3 tokens per surface from a small alphabet => realistic shingle
    # overlap (some true near-dup clusters), deterministic content
    base = spark.range(n_surfaces).select(
        F.when(F.col("id") % 3 == 0, "Peop")
        .when(F.col("id") % 3 == 1, "Org")
        .otherwise("Loc")
        .alias("ent_type"),
        F.concat_ws(
            " ",
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id"), F.lit(997)).cast("string")),
            F.concat(F.lit("x"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(997)).cast("string")),
            F.concat(F.lit("s"), F.col("id").cast("string")),
        ).alias("surface"),
    )
    # replicate 1-3x so distinct_surfaces has real work
    return base.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.pmod(F.xxhash64("surface"), F.lit(3)))
        ).alias("_r"),
    ).drop("_r")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from antnre_spark import link
    from antnre_spark.session import get_spark

    spark = get_spark(
        "linking-boundary", cores=args.cpus, shuffle_partitions=2 * args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    mentions = synth_mentions(spark, args.n)
    mentions = mentions.localCheckpoint(eager=True)  # untimed input setup

    def time_path(local: bool) -> float:
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            sm, ents = link.link_entities(
                mentions, local_threshold=10**9 if local else 0
            )
            ents.count()
            sm.unpersist(blocking=True)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 2)

    t_local = time_path(True)
    t_dist = time_path(False)
    report = {
        "n_surfaces": args.n,
        "cpus": args.cpus,
        "local_path_sec": t_local,
        "distributed_path_sec": t_dist,
        "local_over_dist": round(t_local / t_dist, 2),
        "measured_at": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| linking cutover @ {args.n} surfaces | local[{args.cpus}] "
            f"| local path {t_local}s | distributed path {t_dist}s "
            f"| ratio {report['local_over_dist']} |\n"
        )


if __name__ == "__main__":
    main()
