"""Interleaved A/B timing of individual driver entries across two code
trees — the noise-vs-regression tiebreaker for sub-second bench deltas on a
shared VM whose wall noise (+-30-40%) exceeds the effect under test.

Runs each (tree, query) leg in a fresh subprocess (own SparkSession, same
warm-up), strictly interleaved A,B,A,B,... inside one host window so both
trees see the same hypervisor weather; reports per-leg times, medians, and
min-vs-min. Usage:

    python scripts/ab_entries.py <treeA> <treeB> <query[,query...]> [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["AB_TREE"])
from topicrawler_spark.session import get_spark
import __spark_entry__ as entrymod
spark = get_spark(app_name="ab-entry", master="local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
# warm the session: JVM JIT + python worker pool, like bench.py's steady state
spark.range(1000000).selectExpr("sum(id)").collect()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {}
for q in os.environ["AB_QUERIES"].split(","):
    fn = entrymod.queries()[q]
    t0 = time.time()
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        fn(spark, sf_dir).count()
    out[q] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_leg(tree: str, queries: str) -> dict:
    env = dict(os.environ)
    env["AB_TREE"] = tree
    env["AB_QUERIES"] = queries
    env["PYTHONPATH"] = tree
    r = subprocess.run(
        [sys.executable, "-c", SNIPPET],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=tree,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT ") :])
    raise RuntimeError(f"no result from {tree}: {r.stdout[-500:]} {r.stderr[-500:]}")


def main() -> None:
    tree_a, tree_b, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    legs_a, legs_b = [], []
    for i in range(repeats):
        legs_a.append(run_leg(tree_a, queries))
        legs_b.append(run_leg(tree_b, queries))
        print(f"[ab] round {i + 1}/{repeats}: A={legs_a[-1]} B={legs_b[-1]}", file=sys.stderr)
    summary = {}
    for q in queries.split(","):
        ta = sorted(l[q] for l in legs_a)
        tb = sorted(l[q] for l in legs_b)
        summary[q] = {
            "a_runs": ta,
            "b_runs": tb,
            "a_min": ta[0],
            "b_min": tb[0],
            "a_median": ta[len(ta) // 2],
            "b_median": tb[len(tb) // 2],
        }
    print(json.dumps({"tree_a": tree_a, "tree_b": tree_b, "summary": summary}))


if __name__ == "__main__":
    main()
