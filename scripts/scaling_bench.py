"""Two-cluster-size scaling evidence (sandbox form of the N vs 4N executor
requirement): run the identical crawl-round job at two local parallelism
levels on the same input and report throughput at both plus the scaling
efficiency. Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cores: int, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    env = {
        "BENCH_PAGES": os.environ.get("BENCH_PAGES", "20000"),
        "BENCH_ROUNDS": os.environ.get("BENCH_ROUNDS", "4"),
        "BENCH_QUOTA": os.environ.get("BENCH_QUOTA", "200"),
        "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    }
    r_low = run_bench(low, env)
    r_high = run_bench(high, env)
    t_low = r_low["detail"]["crawl_sec"]
    t_high = r_high["detail"]["crawl_sec"]
    thr_low = r_low["value"]
    thr_high = r_high["value"]
    core_ratio = high / low
    speedup = thr_high / thr_low if thr_low else 0.0
    efficiency = speedup / core_ratio

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — crawl-round scaling evidence

Same job, same deterministic input (seed=42, {env['BENCH_PAGES']} pages,
{env['BENCH_ROUNDS']} rounds, per-host quota {env['BENCH_QUOTA']}), two
parallelism levels — the sandbox rendition of the N vs 4N executor
requirement from BASELINE.json.

| cores | crawl wall (s) | URLs expanded+scored/sec |
|---|---|---|
| local[{low}] | {t_low} | {thr_low} |
| local[{high}] | {t_high} | {thr_high} |

- core ratio: {core_ratio:.1f}x
- throughput speedup: {speedup:.2f}x
- **scaling efficiency: {efficiency:.2f}** (target >= 0.8 in the cluster
  setting; single-JVM local mode shares one driver, one scheduler, one GC and
  one Python-worker pool across all cores, so local-mode efficiency is a
  conservative lower bound on multi-executor efficiency)

Secondary operator timings at {env['SPARK_GRAFT_SF_DIR']} (seconds):

| query | local[{low}] | local[{high}] |
|---|---|---|
"""
    for q in r_low["queries"]:
        md += f"| {q} | {r_low['queries'][q]} | {r_high['queries'].get(q, '-')} |\n"
    md += f"""
Raw JSON:

- local[{low}]: `{json.dumps(r_low)}`
- local[{high}]: `{json.dumps(r_high)}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"low": r_low, "high": r_high, "efficiency": efficiency}))


if __name__ == "__main__":
    main()
