"""kg_eval job (SURVEY.md §3.4) — CoNLL04-style P/R/F1 of a pipeline run
against the oracle golden triples.

spark-submit --py-files kg.zip jobs/evaluate.py --out <table root> \
    [--golden fixtures/data/golden]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from antnre_spark.evaluate import eval_mentions, eval_triples  # noqa: E402
from antnre_spark.pipeline import PipelineConfig  # noqa: E402
from antnre_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--golden", default="fixtures/data/golden")
    ap.add_argument("--weights", default="fixtures/data/weights.npz")
    ap.add_argument("--vocab", default="fixtures/data/vocab.json")
    args = ap.parse_args()

    spark = get_spark("kg_eval")
    cfg = PipelineConfig(
        out_root=args.out, weights_npz=args.weights, vocab_json=args.vocab
    )
    golden = Path(args.golden)
    mentions = cfg.table("mentions").load(spark)
    triples = cfg.table("triples").load(spark)
    if mentions is None or triples is None:
        raise SystemExit(
            "no mentions/triples tables under --out: run jobs/extract.py "
            "and jobs/link_materialize.py first"
        )
    report = {
        "mentions": eval_mentions(
            mentions,
            spark.read.parquet(str(golden / "mentions.parquet")),
        ),
        "triples": eval_triples(
            triples,
            spark.read.parquet(str(golden / "triples.parquet")),
        ),
    }
    ok = all(
        report[k]["precision"] >= 0.95 and report[k]["recall"] >= 0.95
        for k in report
    )
    report["parity_ok"] = ok
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
