"""N-vs-4N executor scaling on a LOCAL STANDALONE CLUSTER (the most
faithful in-sandbox evidence for BASELINE.json:14's "two cluster sizes
(N and 4N executors)" criterion).

Unlike local[K] (one JVM = driver + all executors sharing one heap/GC),
this harness launches a real Spark standalone master plus separate WORKER
JVMs (each worker hosts one executor JVM with its own heap), then runs the
flagship pipeline at 1 executor vs 4 executors (4 cores / 6g each). The
executor processes are exactly what a multi-machine cluster runs — only
the network hop is missing.

Usage: python BENCH/standalone_scaling.py [--sf ...] [--mult 16]
Appends results to BENCH/BASELINE.md and prints a JSON report.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from datetime import datetime, timezone

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SPARK_BIN = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-class")
MASTER_URL = "spark://127.0.0.1:7077"
WORKER_CORES = 4
WORKER_MEM = "6g"


def _spawn(cls: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["SPARK_NO_DAEMONIZE"] = "1"
    env["OPENBLAS_NUM_THREADS"] = "1"
    return subprocess.Popen(
        [SPARK_BIN, cls, *args],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=env,
        preexec_fn=os.setsid,
    )


def start_master() -> subprocess.Popen:
    p = _spawn(
        "org.apache.spark.deploy.master.Master",
        "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8089",
    )
    time.sleep(6)
    return p


def start_workers(n: int) -> list[subprocess.Popen]:
    procs = []
    for i in range(n):
        procs.append(
            _spawn(
                "org.apache.spark.deploy.worker.Worker",
                MASTER_URL,
                "-c", str(WORKER_CORES),
                "-m", WORKER_MEM,
                "--webui-port", str(8100 + i),
            )
        )
    time.sleep(8)
    return procs


def stop(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGTERM)
        except ProcessLookupError:
            pass
    time.sleep(2)


def cluster_session(total_cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(MASTER_URL)
        .appName(f"standalone-scaling-{total_cores}")
        .config("spark.executor.cores", str(WORKER_CORES))
        .config("spark.executor.memory", WORKER_MEM)
        .config("spark.cores.max", str(total_cores))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(2 * total_cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .getOrCreate()
    )


def prepare_inputs(sf_dir: str, mult: int) -> tuple[str, str]:
    """Materialize the big + warm-up transcript tables via a local session."""
    import __spark_entry__ as entrymod
    from antnre_spark.session import get_spark

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    paths = {}
    spark = get_spark("prep", cores=16, shuffle_partitions=32)
    for m in (mult, 1):
        path = f"/tmp/bench_input_{sf_name}_m{m}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            entrymod.synth_transcripts(spark, sf_dir, mult=m).write.mode(
                "overwrite"
            ).parquet(path)
        paths[m] = path
    spark.stop()
    return paths[mult], paths[1]


def measure(n_workers: int, input_path: str, warm_path: str) -> dict:
    import __spark_entry__ as entrymod

    workers = start_workers(n_workers)
    try:
        spark = cluster_session(n_workers * WORKER_CORES)
        try:
            n_turns = spark.read.parquet(input_path).count()
            entrymod.run_kg_pipeline(spark, spark.read.parquet(warm_path)).count()
            t0 = time.perf_counter()
            rows = entrymod.run_kg_pipeline(
                spark, spark.read.parquet(input_path)
            ).count()
            wall = time.perf_counter() - t0
        finally:
            spark.stop()
    finally:
        stop(workers)
    return {
        "executors": n_workers,
        "cores": n_workers * WORKER_CORES,
        "turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "triples": rows,
    }


def measure_train(n_workers: int, mult: int, epochs: int, dtype: str) -> dict:
    """Training-path twin of measure() (r6): fit_joint epochs over the
    fixture gold replicated mult-x, on REAL separate executor JVMs.
    This is the cleanest N-vs-4N evidence for the training path — in
    local[K] mode the single JVM's I/O and Arrow threads spill past K
    cores and soften the small-N baseline; a standalone worker hosts
    one executor with exactly -c task slots."""
    import json as _json

    import numpy as np
    from pyspark.sql import functions as F

    from antnre_spark import train

    workers = start_workers(n_workers)
    try:
        spark = cluster_session(n_workers * WORKER_CORES)
        try:
            gold = spark.read.parquet(
                os.path.join(REPO, "fixtures/data/gold_annotations.parquet")
            )
            big = (
                gold.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
                .repartition(4 * n_workers * WORKER_CORES)
                .persist()
            )
            n = big.count()
            with np.load(os.path.join(REPO, "fixtures/data/weights.npz")) as z:
                w = {k: z[k] for k in z.files}
            with open(os.path.join(REPO, "fixtures/data/vocab.json")) as f:
                vocab = _json.load(f)
            train.fit_joint(big, w, vocab, epochs=1, lr=0.05, rel_weight=1.0, dtype=dtype)
            t0 = time.perf_counter()
            train.fit_joint(big, w, vocab, epochs=epochs, lr=0.05, rel_weight=1.0, dtype=dtype)
            wall = time.perf_counter() - t0
        finally:
            spark.stop()
    finally:
        stop(workers)
    return {
        "executors": n_workers,
        "cores": n_workers * WORKER_CORES,
        "sentences": n,
        "epochs": epochs,
        "wall_sec": round(wall, 3),
        "sent_epochs_per_sec": round(n * epochs / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--n", type=int, default=1, help="executors at the small size")
    ap.add_argument(
        "--train",
        action="store_true",
        help="measure the joint-training path (fit_joint epochs) instead "
        "of kg_pipeline; --mult then replicates the fixture gold table",
    )
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    if args.train:
        master = start_master()
        try:
            lo = measure_train(args.n, args.mult, args.epochs, args.dtype)
            hi = measure_train(4 * args.n, args.mult, args.epochs, args.dtype)
        finally:
            stop([master])
        eff = hi["sent_epochs_per_sec"] / (4 * lo["sent_epochs_per_sec"])
        report = {
            "mode": "standalone-cluster (separate executor JVMs)",
            "query": "fit_joint_epoch",
            "dtype": args.dtype,
            "N_executors": lo,
            "4N_executors": hi,
            "scaling_efficiency": round(eff, 3),
            "pass": eff >= 0.8,
            "measured_at": datetime.now(timezone.utc).isoformat(),
        }
        print(json.dumps(report, indent=2))
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n| fit_joint (standalone, {args.dtype}) | {lo['executors']} executor x{WORKER_CORES}c "
                f"| {lo['sentences']}x{args.epochs}ep | {lo['wall_sec']} | {lo['sent_epochs_per_sec']}/s |\n"
                f"| fit_joint (standalone, {args.dtype}) | {hi['executors']} executors x{WORKER_CORES}c "
                f"| {hi['sentences']}x{args.epochs}ep | {hi['wall_sec']} | {hi['sent_epochs_per_sec']}/s |\n"
                f"| **training efficiency (N vs 4N executors)** | — | — | — | **{round(eff,3)}** |\n"
            )
        return

    input_path, warm_path = prepare_inputs(args.sf, args.mult)
    master = start_master()
    try:
        lo = measure(args.n, input_path, warm_path)
        hi = measure(4 * args.n, input_path, warm_path)
    finally:
        stop([master])

    eff = hi["turns_per_sec"] / (4 * lo["turns_per_sec"])
    report = {
        "mode": "standalone-cluster (separate executor JVMs)",
        "query": "kg_pipeline",
        "N_executors": lo,
        "4N_executors": hi,
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "measured_at": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n| kg_pipeline (standalone) | {lo['executors']} executor x{WORKER_CORES}c "
            f"| {lo['turns']} | {lo['wall_sec']} | {lo['turns_per_sec']} |\n"
            f"| kg_pipeline (standalone) | {hi['executors']} executors x{WORKER_CORES}c "
            f"| {hi['turns']} | {hi['wall_sec']} | {hi['turns_per_sec']} |\n"
            f"| **efficiency (N vs 4N executors)** | — | — | — | **{round(eff,3)}** |\n"
        )


if __name__ == "__main__":
    main()
