"""Spark event-log job-level packing analysis.

Usage: python scripts/joblog.py /tmp/spark-events [cores]

For each job: wall (JobEnd-JobStart), sum of task run time, packing %
(task-sec / cores / wall), and the first stage name — the diagnosis tool
from the round-4 scaling work (job-level, NOT stage-level: stage
submissions overlap inside a job). Serial residue shows up as the gaps
between jobs and as low-packing jobs.
"""
from __future__ import annotations

import json
import os
import sys


def iter_events(d: str):
    files = []
    for root, _, names in os.walk(d):
        for n in names:
            if "eventlog" in n.lower() or n.startswith("app-") or n.startswith("local-"):
                files.append(os.path.join(root, n))
            elif n.startswith("events_") or n.endswith(".zstd"):
                files.append(os.path.join(root, n))
    files.sort(key=os.path.getmtime)
    for f in files:
        if f.endswith(".zstd"):
            import subprocess

            out = subprocess.run(["zstd", "-dc", f], capture_output=True)
            lines = out.stdout.decode("utf-8", "replace").splitlines()
        else:
            with open(f, "r", errors="replace") as fh:
                lines = fh.read().splitlines()
        for ln in lines:
            if not ln.startswith("{"):
                continue
            try:
                yield json.loads(ln)
            except json.JSONDecodeError:
                continue


def main() -> None:
    d = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    jobs: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    stage_name: dict[int, str] = {}
    for ev in iter_events(d):
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "end": None,
                "task_ms": 0.0,
                "ntasks": 0,
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:60],
            }
            for s in ev.get("Stage Infos", []):
                stage_job[s["Stage ID"]] = jid
                stage_name[s["Stage ID"]] = s.get("Stage Name", "")[:50]
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif t == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            jid = stage_job.get(sid)
            if jid is None or jid not in jobs:
                continue
            ti = ev.get("Task Info", {})
            dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            jobs[jid]["task_ms"] += max(dur, 0)
            jobs[jid]["ntasks"] += 1

    done = sorted(
        (j for j in jobs.items() if j[1]["end"]), key=lambda kv: kv[1]["start"]
    )
    if not done:
        print("no completed jobs")
        return
    t0 = done[0][1]["start"]
    prev_end = t0
    total_wall = 0.0
    total_gap = 0.0
    total_task = 0.0
    print(f"{'job':>4} {'t+s':>8} {'gap_s':>7} {'wall_s':>8} {'task_s':>9} "
          f"{'pack%':>6} {'tasks':>6}  first-stage / desc")
    for jid, j in done:
        wall = (j["end"] - j["start"]) / 1e3
        gap = (j["start"] - prev_end) / 1e3
        prev_end = max(prev_end, j["end"])
        task_s = j["task_ms"] / 1e3
        pack = 100.0 * task_s / cores / wall if wall > 0 else 0.0
        total_wall += wall
        total_gap += max(gap, 0)
        total_task += task_s
        name = stage_name.get(j["stages"][0], "") if j["stages"] else ""
        print(
            f"{jid:>4} {(j['start']-t0)/1e3:>8.1f} {gap:>7.2f} {wall:>8.2f} "
            f"{task_s:>9.1f} {pack:>6.1f} {j['ntasks']:>6}  {j['desc'] or name}"
        )
    span = (done[-1][1]["end"] - t0) / 1e3
    # true driver-serial idle: time with NO job running at all (the per-job
    # gap column is sequential and mis-counts when jobs overlap, e.g. AQE
    # query-stage futures) — union the [start, end] intervals and subtract
    idle = 0.0
    ivs = sorted((j["start"], j["end"]) for _, j in done)
    cur0, cur1 = ivs[0]
    for a, b in ivs[1:]:
        if a > cur1:
            idle += a - cur1
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    print(
        f"\nspan={span:.1f}s  sum_job_wall={total_wall:.1f}s  "
        f"sum_gaps={total_gap:.1f}s  idle(no job running)={idle/1e3:.1f}s  "
        f"sum_task={total_task:.1f}s  "
        f"overall pack={100.0*total_task/cores/span:.1f}% of {cores} cores"
    )


if __name__ == "__main__":
    main()
