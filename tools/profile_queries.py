"""Per-query job/stage/task profile: run named queries under a job group and
report {jobs, stages, tasks, wall_sec, rows, plan_lines} each -- the
plan-movement evidence that separates real optimization from wall-clock
ambience (VERDICT r15 item 6: counts are ambience-immune, timings are not).

Usage: python tools/profile_queries.py QUERY [QUERY ...] [-n RUNS]
       (sf dir from $SPARK_GRAFT_SF_DIR; counts are from the LAST run,
       wall_sec is the median of RUNS runs, default 1)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402


def profile_one(spark, spec, sf_dir: str, group: str) -> dict:
    sc = spark.sparkContext
    sc.setJobGroup(group, f"profile {group}")
    t0 = time.time()
    df = spec.builder(spark, sf_dir)
    n = df.count()
    wall = time.time() - t0
    # plan size AFTER the action (cheap; the formatted explain of the built
    # frame -- the same artifact tools/explain_one.py dumps)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan_lines = len(buf.getvalue().splitlines())
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    stages = 0
    tasks = 0
    for jid in job_ids:
        jinfo = tracker.getJobInfo(jid)
        if jinfo is None:
            continue
        for sid in jinfo.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is None:
                continue
            stages += 1
            tasks += sinfo.numTasks
    sc.setLocalProperty("spark.jobGroup.id", None)
    spark.catalog.clearCache()
    return {
        "jobs": len(job_ids),
        "stages": stages,
        "tasks": tasks,
        "wall_sec": round(wall, 3),
        "rows": n,
        "plan_lines": plan_lines,
    }


def main() -> None:
    args = sys.argv[1:]
    n_runs = 1
    if "-n" in args:
        k = args.index("-n")
        n_runs = int(args[k + 1])
        args = args[:k] + args[k + 2 :]
    if not args:
        sys.exit("usage: python tools/profile_queries.py QUERY [QUERY...] [-n RUNS]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    unknown = [n for n in args if n not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    # session warmup (JVM + python workers), same as bench.py
    specs["q1_pricing_summary"].builder(spark, sf_dir).count()
    spark.catalog.clearCache()
    report = {}
    for name in args:
        walls = []
        prof = None
        for i in range(n_runs):
            prof = profile_one(spark, specs[name], sf_dir, f"prof-{name}-{i}")
            walls.append(prof["wall_sec"])
        srt = sorted(walls)
        mid = len(srt) // 2
        prof["wall_sec_runs"] = walls
        prof["wall_sec_median"] = (
            srt[mid] if len(srt) % 2 else round((srt[mid - 1] + srt[mid]) / 2, 3)
        )
        report[name] = prof
        print(f"# {name}: {prof}", file=sys.stderr)
    print(json.dumps({"metric": "query_profiles", "queries": report,
                      "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
