"""Graph-analytics scaling probe: PageRank N-vs-4N on a synthetic KG.

Same methodology as BENCH/run_scaling.py (no real cluster in the
sandbox): the SAME pagerank job runs at two local parallelism levels in
fresh JVMs; efficiency = throughput(4N) / (4 x throughput(N)), where
throughput = edge-iterations / second.

The input is a deterministic hash-random digraph ("entity" vertices,
out-degree drawn from the hash so hubs exist): vertex count scales with
--mult, avg out-degree ~8, built distributively with spark.range — no
driver-side edge list. A power-law-ish hub is planted explicitly (every
vertex id % 101 == 0 also links to vertex 0) so the skew path is
exercised, not just uniform fan-out.

Usage: python BENCH/graph_scaling.py [--mult 64] [--n 4] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker() -> None:
    """Runs inside the fresh JVM: build the graph, run pagerank, print
    one JSON line."""
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession, functions as F

    from antnre_spark.graph import pagerank

    cpus = int(os.environ["GS_CPUS"])
    mult = int(os.environ["GS_MULT"])
    iters = int(os.environ["GS_ITERS"])
    n_vertices = 10_000 * mult
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"graph_scaling_{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # deterministic hash graph: each vertex v emits d(v) = 4 + (h % 9)
    # edges to pseudo-random targets; v % 101 == 0 also -> hub 0
    v = spark.range(n_vertices).select(F.col("id").alias("src_id"))
    d = (F.xxhash64("src_id", F.lit(1)) % 9 + 9) % 9 + 4
    edges = (
        v.select("src_id", F.explode(F.sequence(F.lit(0), d - 1)).alias("k"))
        .select(
            "src_id",
            (
                (F.xxhash64("src_id", "k", F.lit(2)) % n_vertices + n_vertices)
                % n_vertices
            ).alias("dst_id"),
        )
        .unionByName(
            v.filter(F.col("src_id") % 101 == 0).select(
                "src_id", F.lit(0).alias("dst_id")
            )
        )
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.col("src_id").cast("string").alias("src"),
            F.col("dst_id").cast("string").alias("dst"),
        )
    ).persist()
    n_edges = edges.count()  # materialize input outside the timed region

    # Warm the JVM first (JIT + whole-stage-codegen caches) with a
    # short discarded run of the SAME job shape: the timed run below
    # still pays the full pipeline including setup shuffles, but not
    # the fresh-JVM compile tax, which is a fixed cost that would
    # otherwise deflate the 4N level's efficiency reading.
    pagerank(edges, iterations=2).agg(F.sum("rank")).first()

    t0 = time.monotonic()
    ranks = pagerank(edges, iterations=iters)
    total = ranks.agg(F.sum("rank")).first()[0]  # force + sanity
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "vertices": n_vertices,
                "edges": n_edges,
                "iterations": iters,
                "wall_s": round(wall, 3),
                "edge_iters_per_s": round(n_edges * iters / wall, 1),
                "rank_sum": round(total, 9),
            }
        )
    )
    spark.stop()


def run_once(cpus: int, mult: int, iters: int) -> dict:
    env = dict(os.environ)
    env.update(
        GS_CPUS=str(cpus), GS_MULT=str(mult), GS_ITERS=str(iters),
        GS_WORKER="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=64)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    # INTERLEAVE the two levels across repeats (lo,hi,lo,hi...) so a
    # host-speed window drift mid-probe biases both levels, not one —
    # this box's windows oscillate on a ~2-5 min scale (BENCH/
    # BASELINE.md drift ledger) and a blocked lo,lo,hi,hi order reads
    # whichever level hit the slow window as the engine's fault.
    lo = hi = None
    for _ in range(args.repeats):
        r_lo = run_once(args.n, args.mult, args.iters)
        r_hi = run_once(4 * args.n, args.mult, args.iters)
        if lo is None or r_lo["wall_s"] < lo["wall_s"]:
            lo = r_lo
        if hi is None or r_hi["wall_s"] < hi["wall_s"]:
            hi = r_hi
    assert abs(lo["rank_sum"] - 1.0) < 1e-6 and abs(hi["rank_sum"] - 1.0) < 1e-6
    eff = hi["edge_iters_per_s"] / (4 * lo["edge_iters_per_s"])
    print(
        json.dumps(
            {
                "measured_at": datetime.now(timezone.utc).isoformat(),
                "mult": args.mult,
                "low": lo,
                "high": hi,
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("GS_WORKER"):
        _worker()
    else:
        main()
