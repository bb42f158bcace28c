"""Per-query profile of the bench HEADLINE list via the Spark event log.

    python tools/profile_bench.py [query ...]

Runs each query with bench.py's methodology (1 untimed warmup + timed
runs), labelling jobs with the query name, then parses the event log to
report per query: wall seconds, number of Spark jobs, stages, tasks,
total task time, max single task time, shuffle bytes written and
records, and Python-worker time if any. This is the guide-§1 "where is
the time actually going" readout in a UI-less environment.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
EVDIR = "/tmp/aqe_eventlogs"


def main() -> None:
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from approximatequeryengine_spark import get_spark
    from approximatequeryengine_spark.workload import QUERIES

    spark = get_spark(
        app_name="aqe-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        from bench import HEADLINE
        names = list(HEADLINE)

    QUERIES["exact_count"](spark, SF_DIR).collect()  # session warmup

    walls: dict[str, float] = {}
    for name in names:
        QUERIES[name](spark, SF_DIR).collect()  # untimed warmup
        sc = spark.sparkContext
        sc.setJobDescription(f"PROF:{name}")
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).collect()
        walls[name] = time.time() - t0
        sc.setJobDescription(None)
    spark.stop()

    # --- parse the event log ---------------------------------------
    logs = [
        p
        for p in glob.glob(os.path.join(EVDIR, "**"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    jobs_by_q: dict[str, list[int]] = defaultdict(list)
    job_of_stage: dict[int, int] = {}
    q_of_job: dict[int, str] = {}
    stats = defaultdict(lambda: defaultdict(float))
    for path in logs:
        with open(path) as fh:
            for line in fh:
                ev = json.loads(line)
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    if desc.startswith("PROF:"):
                        q = desc[5:]
                        jid = ev["Job ID"]
                        jobs_by_q[q].append(jid)
                        q_of_job[jid] = q
                        for sid in ev.get("Stage IDs", []):
                            job_of_stage[sid] = jid
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    jid = job_of_stage.get(sid)
                    if jid is None or jid not in q_of_job:
                        continue
                    q = q_of_job[jid]
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                    s = stats[q]
                    s["tasks"] += 1
                    s["task_sec"] += dur
                    s["max_task_sec"] = max(s["max_task_sec"], dur)
                    s["gc_sec"] += tm.get("JVM GC Time", 0) / 1e3
                    sw = tm.get("Shuffle Write Metrics") or {}
                    s["shuf_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                    s["shuf_write_recs"] += sw.get("Shuffle Records Written", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    s["shuf_read_mb"] += (
                        sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                    ) / 1e6
                    inp = tm.get("Input Metrics") or {}
                    s["input_mb"] += inp.get("Bytes Read", 0) / 1e6
                    s["input_recs"] += inp.get("Records Read", 0)
                elif e == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    sid = si.get("Stage ID")
                    jid = job_of_stage.get(sid)
                    if jid is not None and jid in q_of_job:
                        stats[q_of_job[jid]]["stages"] += 1

    hdr = (
        f"{'query':34s} {'wall_s':>7s} {'jobs':>4s} {'stages':>6s} {'tasks':>5s} "
        f"{'task_s':>7s} {'maxtask':>7s} {'shW_MB':>7s} {'shW_rec':>8s} "
        f"{'in_MB':>6s} {'in_rec':>8s}"
    )
    print(hdr)
    for q in names:
        s = stats[q]
        print(
            f"{q:34s} {walls.get(q, -1):7.3f} {len(jobs_by_q[q]):4d} "
            f"{int(s['stages']):6d} {int(s['tasks']):5d} {s['task_sec']:7.2f} "
            f"{s['max_task_sec']:7.2f} {s['shuf_write_mb']:7.2f} "
            f"{int(s['shuf_write_recs']):8d} {s['input_mb']:6.1f} "
            f"{int(s['input_recs']):8d}"
        )


if __name__ == "__main__":
    main()
