"""Per-stage profile of the bench build via the Spark event log —
storm-robust attribution (take the fastest of N builds and show where
its wall time went). Guide §1.1/§7.1 without the UI (disabled here)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_assets_spark.corpus import generate_corpus
from elasticsearch_assets_spark.indexing.build import build_and_write_index
from elasticsearch_assets_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS = int(os.environ.get("BENCH_DOCS", "240000"))
RUNS = int(os.environ.get("RUNS", "4"))


def main():
    shm = tempfile.mkdtemp(prefix="sprof_", dir="/dev/shm")
    os.environ["TMPDIR"] = shm
    tempfile.tempdir = None
    evdir = os.path.join(shm, "evlog")
    os.makedirs(evdir)
    spark = get_spark(
        app_name="build_stageprof",
        cpus=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    corpus_path = os.path.join(shm, "corpus")
    generate_corpus(spark, DOCS, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus_path)

    runs = []
    for r in range(RUNS):
        out = os.path.join(shm, f"idx_{r}")
        t0 = time.time()
        build_and_write_index(spark.read.parquet(corpus_path), out,
                              n_buckets=32)
        dt = time.time() - t0
        runs.append((dt, t0 * 1000, (t0 + dt) * 1000))
        shutil.rmtree(out, ignore_errors=True)
        print(f"run {r}: {dt:.2f}s", file=sys.stderr, flush=True)
    spark.stop()
    time.sleep(2)

    best = min(runs)
    print(f"runs: {[round(r[0], 2) for r in runs]}; profiling best "
          f"{best[0]:.2f}s window")
    w0, w1 = best[1], best[2]

    import subprocess

    stages = {}
    jobs = {}
    taskagg = {}
    for path in glob.glob(os.path.join(evdir, "*", "events_*")):
        if path.endswith(".zstd"):
            raw = subprocess.run(
                ["zstd", "-d", "-c", path], capture_output=True
            ).stdout.decode()
        else:
            raw = open(path).read()
        for line in raw.splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None or comp < w0 or sub > w1:
                    continue
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "sub": sub, "comp": comp,
                    "wall": (comp - sub) / 1000.0,
                    "tasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerJobStart":
                t = ev.get("Submission Time", 0)
                if w0 <= t <= w1:
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = props.get(
                        "spark.job.description", "?")[:60]
            elif e == "SparkListenerTaskEnd":
                si_id = ev.get("Stage ID")
                m = ev.get("Task Metrics") or {}
                s = taskagg.setdefault(si_id, {"task_ms": 0, "shuf_w": 0,
                                               "shuf_r": 0, "max_ms": 0})
                rt = m.get("Executor Run Time", 0)
                s["task_ms"] += rt
                s["max_ms"] = max(s["max_ms"], rt)
                s["shuf_w"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                s["shuf_r"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0)

    for sid in sorted(stages):
        s = stages[sid]
        t = taskagg.get(sid, {})
        print(f"stage {sid:3d}  wall={s['wall']:6.2f}s "
              f"task_sum={t.get('task_ms', 0)/1000.0:7.1f}s "
              f"task_max={t.get('max_ms', 0)/1000.0:6.2f}s "
              f"tasks={s['tasks']:4d} "
              f"shufW={t.get('shuf_w', 0)/1e6:7.1f}MB "
              f"shufR={t.get('shuf_r', 0)/1e6:7.1f}MB  {s['name']}")
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
