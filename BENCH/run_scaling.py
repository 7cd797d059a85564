"""Two-cluster-size scaling evidence (BASELINE.json:2,14: throughput
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two local parallelism levels on the SAME input:
local[8] (N) vs local[32] (4N), each in a fresh subprocess/JVM. Efficiency
= throughput(4N) / (4 x throughput(N)). Results are appended to
BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [--sf /root/testdata/sf0.1] [--query kg_pipeline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(
    cpus: int,
    sf_dir: str,
    query: str,
    mult: int = 1,
    warmup: bool = True,
    repeats: int = 3,
) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_TURNS_MULT"] = str(mult)
    env["SPARK_GRAFT_WARMUP"] = "1" if warmup else "0"
    env["SPARK_GRAFT_REPEATS"] = str(repeats)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), query],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--query", default="kg_pipeline")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--mult", type=int, default=8, help="turns multiplier")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    n, n4 = args.n, 4 * args.n

    lo = run_once(n, args.sf, args.query, args.mult, not args.no_warmup, args.repeats)
    hi = run_once(n4, args.sf, args.query, args.mult, not args.no_warmup, args.repeats)
    turns = lo["input_turns"]
    report = {
        "sf": lo["sf"],
        "input_turns": turns,
        "repeats": args.repeats,
        "measured_at": datetime.now(timezone.utc).isoformat(),
        "queries": {},
    }
    md_rows = []
    for qname in args.query.split(","):
        t_lo = lo["queries"][qname]
        t_hi = hi["queries"][qname]
        thr_lo, thr_hi = turns / t_lo, turns / t_hi
        eff = thr_hi / (4 * thr_lo)
        report["queries"][qname] = {
            f"local[{n}]_sec": t_lo,
            f"local[{n4}]_sec": t_hi,
            f"local[{n}]_turns_per_sec": round(thr_lo, 1),
            f"local[{n4}]_turns_per_sec": round(thr_hi, 1),
            "scaling_efficiency": round(eff, 3),
            "pass": eff >= 0.8,
        }
        # best-of-N secondary (continuity with the r4/r5 criterion rows,
        # which used best-of-2): min is optimistic under sustained load
        # but robust to one mid-level window flip in either sample.
        if "queries_min" in lo and "queries_min" in hi:
            m_lo, m_hi = lo["queries_min"][qname], hi["queries_min"][qname]
            report["queries"][qname]["scaling_efficiency_best"] = round(
                (turns / m_hi) / (4 * (turns / m_lo)), 3
            )
        md_rows.append(
            f"| {qname} | local[{n}] | {turns} | {t_lo} | {round(thr_lo,1)} |\n"
            f"| {qname} | local[{n4}] | {turns} | {t_hi} | {round(thr_hi,1)} |\n"
            f"| **{qname} efficiency** | — | — | — | **{round(eff,3)}** |\n"
        )
    print(json.dumps(report, indent=2))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write("\n" + "".join(md_rows))


if __name__ == "__main__":
    main()
