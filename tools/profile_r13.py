"""Per-query profiling harness for the r13 optimization round.

Runs named registry queries at $SPARK_GRAFT_SF_DIR with the Spark event
log enabled, then parses the log to attribute wall/task time to jobs and
stages per query (guide §1: measure first; §7.1's UI is disabled here,
so the event log is the substitute).

Usage:
    python tools/profile_r13.py q1 q2 ...        # profile named queries
    python tools/profile_r13.py --plans q1 q2    # also dump explain() to
                                                 # plans/r13/<q>_profile.txt

Each query runs twice (warmup at sf0.001 like bench.py, then one timed
run at the target SF) with setJobDescription(name) so log parsing can
group jobs by query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVENT_DIR = "/tmp/spark-events-r13"


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    os.makedirs(EVENT_DIR, exist_ok=True)
    builder = (
        SparkSession.builder.appName("profile-r13")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVENT_DIR)
    )
    return builder.getOrCreate()


def parse_event_log(path: str):
    """Group jobs by description; return per-description stats."""
    jobs = {}  # job_id -> {desc, submit, complete, stages: [ids]}
    stages = {}  # stage_id -> {name, task_time_ms, n_tasks, shuffle_read, shuffle_write, input_bytes, python_time}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "desc": desc,
                    "submit": ev.get("Submission Time", 0),
                    "complete": None,
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["complete"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {})
                st["name"] = si.get("Stage Name", "")
                st["n_tasks"] = si.get("Number of Tasks", 0)
                st["submit"] = si.get("Submission Time")
                st["complete"] = si.get("Completion Time")
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_time_ms"] = st.get("task_time_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["deser_ms"] = st.get("deser_ms", 0) + m.get(
                    "Executor Deserialize Time", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                st["result_ser_ms"] = st.get("result_ser_ms", 0) + m.get(
                    "Result Serialization Time", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                st["shuf_read_b"] = (
                    st.get("shuf_read_b", 0)
                    + srm.get("Remote Bytes Read", 0)
                    + srm.get("Local Bytes Read", 0)
                )
                st["fetch_wait_ms"] = st.get("fetch_wait_ms", 0) + srm.get(
                    "Fetch Wait Time", 0
                )
                swm = m.get("Shuffle Write Metrics") or {}
                st["shuf_write_b"] = st.get("shuf_write_b", 0) + swm.get(
                    "Shuffle Bytes Written", 0
                )
                im = m.get("Input Metrics") or {}
                st["input_b"] = st.get("input_b", 0) + im.get(
                    "Bytes Read", 0
                )
                st["n_done"] = st.get("n_done", 0) + 1
    return jobs, stages


def report(jobs, stages, only_descs=None):
    by_desc = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        by_desc[j["desc"]].append((jid, j))
    for desc, jl in by_desc.items():
        if only_descs is not None and desc not in only_descs:
            continue
        wall = sum(
            (j["complete"] - j["submit"]) / 1000.0
            for _, j in jl
            if j["complete"]
        )
        n_stages = sum(len(j["stages"]) for _, j in jl)
        print(f"\n=== {desc or '(no description)'} ===")
        print(f"  jobs={len(jl)}  stage-slots={n_stages}  job-wall={wall:.2f}s")
        # per-job breakdown
        for jid, j in jl:
            jw = (
                (j["complete"] - j["submit"]) / 1000.0
                if j["complete"]
                else -1
            )
            run_stages = [
                (sid, stages[sid])
                for sid in j["stages"]
                if sid in stages and stages[sid].get("n_done")
            ]
            stot = sum(s.get("task_time_ms", 0) for _, s in run_stages)
            print(
                f"  job {jid}: wall={jw:6.2f}s stages_run={len(run_stages)}"
                f" tasktime={stot/1000.0:7.2f}s"
            )
            for sid, s in sorted(
                run_stages,
                key=lambda kv: -kv[1].get("task_time_ms", 0),
            )[:6]:
                nm = s.get("name", "?")
                print(
                    f"    stage {sid:4d} {s.get('task_time_ms',0)/1000.0:7.2f}s"
                    f" tasks={s.get('n_done',0):3d}"
                    f" gc={s.get('gc_ms',0)/1000.0:5.2f}s"
                    f" fetchwait={s.get('fetch_wait_ms',0)/1000.0:5.2f}s"
                    f" in={s.get('input_b',0)>>20}M"
                    f" sr={s.get('shuf_read_b',0)>>20}M"
                    f" sw={s.get('shuf_write_b',0)>>20}M  {nm[:70]}"
                )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args or list(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup at sf0.001 (codegen/JVM) — same protocol as bench.py
    for n in names:
        try:
            sc.setJobDescription(f"warmup:{n}")
            materialize(qs[n](spark, "/root/testdata/sf0.001"))
        except Exception as exc:
            print(f"warmup {n} failed: {exc}", file=sys.stderr)
    import gc

    wall = {}
    for n in names:
        gc.collect()
        spark.catalog.clearCache()
        try:
            sc._jvm.System.gc()
        except Exception:
            pass
        sc.setJobDescription(n)
        t0 = time.perf_counter()
        materialize(qs[n](spark, sf_dir))
        wall[n] = time.perf_counter() - t0
        if dump_plans:
            os.makedirs(os.path.join(HERE, "plans", "r13"), exist_ok=True)
            with open(
                os.path.join(HERE, "plans", "r13", f"{n}_profile.txt"), "w"
            ) as fh:
                fh.write(qs[n](spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
    sc.setJobDescription(None)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)
    log_path = os.path.join(EVENT_DIR, app_id)
    if not os.path.exists(log_path):
        cands = [
            os.path.join(EVENT_DIR, f)
            for f in os.listdir(EVENT_DIR)
            if app_id in f
        ]
        log_path = cands[0] if cands else None
    print("\n########## per-query wall ##########")
    for n in names:
        print(f"  {wall.get(n, -1):7.2f}s  {n}")
    if log_path and os.path.isdir(log_path):
        # Spark 4 rolling event-log v2: a directory of events_* parts,
        # zstd-compressed when spark.eventLog.compress is on
        import pyarrow as pa

        parts = sorted(
            os.path.join(log_path, f)
            for f in os.listdir(log_path)
            if f.startswith("events_")
        )
        merged = os.path.join("/tmp", f"evmerged_{app_id}.jsonl")
        with open(merged, "wb") as out:
            for p in parts:
                if p.endswith(".zstd"):
                    with pa.CompressedInputStream(p, "zstd") as s:
                        out.write(s.read())
                else:
                    with open(p, "rb") as fh:
                        out.write(fh.read())
        log_path = merged
    if log_path:
        jobs, stages = parse_event_log(log_path)
        report(jobs, stages, only_descs=set(names))


if __name__ == "__main__":
    main()
