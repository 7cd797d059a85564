"""Optimization-round instrumentation (bench.py is FROZEN — guide §1).

Times individual queries()/bench rows with the SAME count() methodology
as bench.py, optionally with a noop-sink isolation pass (guide §1.4) and
an explain("formatted") dump for plans/r08/.

Usage:
  python bench_extra.py <name>[,<name>...] [--sf DIR] [--repeats N]
      [--noop] [--explain plans/r08/suffix] [--no-warmup]

Names resolve against __spark_entry__.queries() plus the bench.py-only
rows (dd_minhash_cands, ss_topk_cosine).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, help="write <name>_<suffix>.txt under plans/r08/")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from antnre_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("antnre-bench-extra", cores=cpus, shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    q = entrymod.queries()
    extra = {
        "ss_topk_cosine": entrymod.q_ss_topk_cosine,
    }
    try:
        from antnre_spark.dedup import minhash_dup_candidates

        extra["dd_minhash_cands"] = lambda s, d: minhash_dup_candidates(
            entrymod._doc(s, d)
        )
    except Exception:
        pass

    out: dict[str, dict] = {}
    for name in args.names.split(","):
        fn = q.get(name) or extra.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain:
            os.makedirs(os.path.join(REPO, "plans", "r08"), exist_ok=True)
            df = fn(spark, args.sf)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = df._jdf.queryExecution().explainString(mode)
            with open(
                os.path.join(REPO, "plans", "r08", f"{name}_{args.explain}.txt"), "w"
            ) as f:
                f.write(txt)
        if not args.no_warmup:
            fn(spark, args.sf).count()
        runs = []
        rows = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            if args.noop:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            else:
                rows = fn(spark, args.sf).count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"samples": runs, "min": min(runs), "rows": rows,
                     "mode": "noop" if args.noop else "count"}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))


if __name__ == "__main__":
    main()
