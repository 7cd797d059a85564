"""N-vs-4N scaling for the distributed JOINT trainer (r5): the new
axis — per-epoch gradient computation is embarrassingly parallel
(per-partition grad sums over Arrow batches), the all-reduce is a
bounded collect (~320 KB/partition), so epochs should scale like the
extraction stage. Evidence for the BASELINE.json two-cluster-size
criterion on the training path.

Each parallelism level runs in a FRESH subprocess/JVM (no shared-JVM
warmth), times E epochs of train.fit_joint over the fixture gold
replicated ``mult``x (distinct sent ids), and reports sentence-epochs/s.

Usage: python BENCH/train_scaling.py [--n 4] [--mult 64] [--epochs 3]
       [--rel-weight 1.0] [--repeats 2]
Prints one JSON line; appends a markdown row to BENCH/BASELINE.md is
left to the operator (numbers are copied into the round section).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
from pyspark.sql import functions as F
from antnre_spark.session import get_spark
from antnre_spark import train

cores = int(os.environ["TS_CORES"])
mult = int(os.environ["TS_MULT"])
epochs = int(os.environ["TS_EPOCHS"])
rel_weight = float(os.environ["TS_RELW"])
dtype = os.environ.get("TS_DTYPE", "float32")
spark = get_spark("train-scaling", cores=cores)
spark.sparkContext.setLogLevel("ERROR")

gold = spark.read.parquet(os.path.join({repo!r}, "fixtures/data/gold_annotations.parquet"))
rep = spark.range(mult).select(F.col("id").alias("_rep"))
big = gold.crossJoin(rep).repartition(4 * cores).persist()
n = big.count()

with np.load(os.path.join({repo!r}, "fixtures/data/weights.npz")) as z:
    w = {{k: z[k] for k in z.files}}
vocab = json.load(open(os.path.join({repo!r}, "fixtures/data/vocab.json")))

# one warmup epoch (worker spin-up, Arrow codepaths), then timed epochs
train.fit_joint(big, w, vocab, epochs=1, lr=0.05, rel_weight=rel_weight, dtype=dtype)
t0 = time.time()
train.fit_joint(big, w, vocab, epochs=epochs, lr=0.05, rel_weight=rel_weight, dtype=dtype)
wall = time.time() - t0
print(json.dumps({{"cores": cores, "sentences": n, "epochs": epochs,
                   "wall_sec": round(wall, 2),
                   "sent_epochs_per_sec": round(n * epochs / wall, 1)}}))
spark.stop()
"""


def run_once(cores: int, mult: int, epochs: int, rel_weight: float, repeats: int, dtype: str) -> dict:
    best = None
    for _ in range(repeats):
        env = dict(
            os.environ,
            TS_CORES=str(cores),
            TS_MULT=str(mult),
            TS_EPOCHS=str(epochs),
            TS_RELW=str(rel_weight),
            TS_DTYPE=dtype,
        )
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--mult", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--rel-weight", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--dtype",
        choices=["float64", "float32"],
        default="float32",
        help="encoder precision; float32 is the corpus-scale default "
        "(r5 verdict task 3 — the float64 BPTT kernel caps at 0.81 "
        "N->4N on this box, the float32 isolate at 0.887)",
    )
    args = ap.parse_args()
    n, n4 = args.n, 4 * args.n
    lo = run_once(n, args.mult, args.epochs, args.rel_weight, args.repeats, args.dtype)
    hi = run_once(n4, args.mult, args.epochs, args.rel_weight, args.repeats, args.dtype)
    eff = round(
        (lo["wall_sec"] / hi["wall_sec"]) / (n4 / n), 3
    )
    print(
        json.dumps(
            {
                "query": "fit_joint_epoch",
                "dtype": args.dtype,
                "sentences": lo["sentences"],
                "epochs": args.epochs,
                f"local[{n}]_sec": lo["wall_sec"],
                f"local[{n4}]_sec": hi["wall_sec"],
                f"local[{n}]_sent_epochs_per_sec": lo["sent_epochs_per_sec"],
                f"local[{n4}]_sent_epochs_per_sec": hi["sent_epochs_per_sec"],
                "scaling_efficiency": eff,
            }
        )
    )


if __name__ == "__main__":
    main()
