"""Train the relation decoder on a gold-annotation table — spark-submit
entry for the distributed training path (antnre_spark/train.py).

Ships as: spark-submit --py-files kg.zip jobs/train_relation_decoder.py \
    --gold fixtures/data/gold_annotations.parquet \
    --weights fixtures/data/weights.npz --vocab fixtures/data/vocab.json \
    --out /tmp/trained.npz [--epochs 150] [--lr 0.1] [--momentum 0.9] [--warm-start]

Feature extraction runs once (distributed, frozen encoder); each epoch
is one data-parallel gradient pass. Writes an npz carrying the FULL
weight set with the four decoder arrays replaced, so the trained file
drops into extract.broadcast_model unchanged. Prints one JSON line with
the loss history and train accuracy.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from antnre_spark import train  # noqa: E402
from antnre_spark.extract import broadcast_model  # noqa: E402
from antnre_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gold", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument(
        "--warm-start",
        action="store_true",
        help="initialize from the decoder weights in --weights instead "
        "of random init (fine-tuning)",
    )
    args = ap.parse_args()

    spark = get_spark("train-relation-decoder")
    spark.sparkContext.setLogLevel("WARN")
    w_bc, v_bc, key = broadcast_model(spark, args.weights, args.vocab)
    gold = spark.read.parquet(args.gold)
    pairs = train.pair_training_frame(gold, w_bc, v_bc, key).persist()
    n_pairs = pairs.count()
    dim_in = len(pairs.first()["feat"])

    init = None
    if args.warm_start:
        with np.load(args.weights) as z:
            init = {k: z[k] for k in ("rel_W1", "rel_b1", "rel_W2", "rel_b2")}
    trained, history = train.fit_relation_decoder(
        pairs, dim_in=dim_in, epochs=args.epochs, lr=args.lr,
        momentum=args.momentum, init=init
    )
    acc = train.training_accuracy(pairs, trained)
    pairs.unpersist()

    with np.load(args.weights) as z:
        full = {k: z[k] for k in z.files}
    full.update(trained)
    np.savez(args.out, **full)
    print(
        json.dumps(
            {
                "n_pairs": n_pairs,
                "dim_in": dim_in,
                "epochs": args.epochs,
                "loss_first": history[0],
                "loss_last": history[-1],
                "train_accuracy": acc,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
