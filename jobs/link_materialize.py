"""kg_link_materialize job (SURVEY.md §3.3) — spark-submit entry.

spark-submit --py-files kg.zip jobs/link_materialize.py --out <table root>
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from antnre_spark.pipeline import PipelineConfig, link_job  # noqa: E402
from antnre_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default="fixtures/data/weights.npz")
    ap.add_argument("--vocab", default="fixtures/data/vocab.json")
    args = ap.parse_args()

    spark = get_spark("kg_link_materialize")
    cfg = PipelineConfig(
        out_root=args.out, weights_npz=args.weights, vocab_json=args.vocab
    )
    print(json.dumps(link_job(spark, cfg)))


if __name__ == "__main__":
    main()
