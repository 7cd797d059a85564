"""Table maintenance job: small-file compaction + snapshot expiry over
every pipeline table under an output root (r4 verdict task 8 — the
operational gap a 10^12-turn table hits first: per-bucket resume commits
and streaming micro-batches each add files, and scan cost grows with
file COUNT even when bytes are flat; overwrite history grows disk by one
table copy per commit until expired).

Ships as: spark-submit --py-files kg.zip jobs/compact.py --out <root> \
    [--min-files 2] [--keep-snapshots 2] [--tables mentions,relations,...]

Works against the IceLite facade (sandbox) or, via
SPARK_GRAFT_USE_ICEBERG=1 plus ``--namespace catalog.db``, the real
Iceberg procedures (rewrite_data_files / expire_snapshots) — the two
backends share the compact()/expire_snapshots() call surface, and
open_table routes each table name to <namespace>.<name> identifiers.
Prints one JSON line with per-table before/after file counts (IceLite)
or the procedure's rewrite counts (Iceberg). Row identity is the pytest
contract (tests/test_icelite.py::TestMaintenance).

Concurrency: drain any live writer (e.g. a start_kg_stream job) before
running maintenance against the same IceLite root. If a racing writer
commits between this job's manifest read and its commit, IceLite's
exclusive commit raises ConcurrentCommitError and THIS job loses —
the pipeline's data commit is never overwritten (r5 ADVICE; the
IceLite twin of Iceberg's CommitFailedException, where the real
backend retries server-side).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from antnre_spark.icelite import IceLite  # noqa: E402
from antnre_spark.session import get_spark  # noqa: E402

DEFAULT_TABLES = (
    "mentions",
    "relations",
    "entities",
    "triples",
    "vertices",
    "hub_entities",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="pipeline output root")
    ap.add_argument("--min-files", type=int, default=2)
    ap.add_argument("--keep-snapshots", type=int, default=2)
    ap.add_argument(
        "--tables",
        default=",".join(DEFAULT_TABLES),
        help="comma-separated table names under --out",
    )
    ap.add_argument(
        "--namespace",
        default=None,
        help="Iceberg 'catalog.db' namespace — with SPARK_GRAFT_USE_ICEBERG"
        "=1, tables resolve to <namespace>.<name> and maintenance runs the"
        " real rewrite_data_files/expire_snapshots procedures",
    )
    args = ap.parse_args()

    from antnre_spark.iceberg_adapter import open_table

    use_iceberg = os.environ.get("SPARK_GRAFT_USE_ICEBERG", "0") == "1"
    if use_iceberg and not args.namespace:
        raise SystemExit(
            "SPARK_GRAFT_USE_ICEBERG=1 requires --namespace catalog.db "
            "(table names resolve to catalog identifiers, not paths)"
        )

    spark = get_spark("kg_compact")
    spark.sparkContext.setLogLevel("WARN")
    report: dict[str, dict] = {}
    for name in args.tables.split(","):
        name = name.strip()
        if use_iceberg:
            t = open_table(spark, f"{args.namespace}.{name}")
            if t.current_snapshot() is None:
                continue
            rows_before = t.total_rows()
            c = t.compact(spark, min_files=args.min_files)
            e = t.expire_snapshots(keep_last=args.keep_snapshots)
            rows_after = t.total_rows()
            if rows_after != rows_before:
                raise RuntimeError(
                    f"{name}: row count changed during maintenance "
                    f"({rows_before} -> {rows_after})"
                )
            report[name] = {"rows": rows_after, **c, **e}
            continue
        path = os.path.join(args.out, name)
        if not os.path.isdir(path):
            continue
        t = IceLite(path)
        if t.current_snapshot() is None:
            continue
        rows_before = t.total_rows()
        c = t.compact(spark, min_files=args.min_files)
        e = t.expire_snapshots(keep_last=args.keep_snapshots)
        rows_after = t.total_rows()
        if rows_after != rows_before:
            raise RuntimeError(
                f"{name}: row count changed during maintenance "
                f"({rows_before} -> {rows_after})"
            )
        report[name] = {
            "rows": rows_after,
            "files_before": c["files_before"],
            "files_after": c["files_after"],
            "expired_snapshots": e["expired_snapshots"],
            "removed_files": e["removed_files"],
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
