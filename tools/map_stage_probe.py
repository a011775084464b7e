"""Decompose the build's map stage (scan+sha+analyze+cache) by CPU —
task_sum from the event log is robust to host storms. Each variant runs
in its own job group; report min wall + median task_sum."""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from elasticsearch_assets_spark.corpus import generate_corpus
from elasticsearch_assets_spark.functions.analyzer import analyze_col
from elasticsearch_assets_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS = int(os.environ.get("BENCH_DOCS", "240000"))
REPS = int(os.environ.get("REPS", "3"))
COMPRESSED = os.environ.get("CACHE_COMPRESSED", "true")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    shm = tempfile.mkdtemp(prefix="mprobe_", dir="/dev/shm")
    os.environ["TMPDIR"] = shm
    tempfile.tempdir = None
    evdir = os.path.join(shm, "evlog")
    os.makedirs(evdir)
    spark = get_spark(
        app_name="map_stage_probe", cpus=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.sql.inMemoryColumnarStorage.compressed": COMPRESSED,
        })
    sc = spark.sparkContext
    corpus_path = os.path.join(shm, "corpus")
    generate_corpus(spark, DOCS, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    base = docs.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    toks = base.withColumn("_toks", analyze_col("content")).withColumn(
        "dl", F.coalesce(F.size("_toks"), F.lit(0)).cast("int")
    )

    variants = {
        "scan": lambda: noop(docs),
        "scan+xxh+sha": lambda: noop(base.drop("content")),
        "scan+sha+analyze": lambda: noop(
            toks.select("doc_id", "content_sha", "dl", "_toks")),
    }

    def cache_variant():
        c = toks.select("doc_id", "dl", "content_sha", "_toks").persist(
            StorageLevel.MEMORY_AND_DISK)
        noop(c)
        c.unpersist(True)

    variants["...+cache_populate"] = cache_variant

    windows = {}
    for name, fn in variants.items():
        fn()  # warm
        for r in range(REPS):
            t0 = time.time()
            fn()
            windows.setdefault(name, []).append((t0 * 1000, time.time() * 1000))
    spark.stop()
    time.sleep(2)

    stages = []
    for d in glob.glob(os.path.join(evdir, "*")):
        ev = glob.glob(os.path.join(d, "events_*"))[0]
        raw = subprocess.run(["zstd", "-d", "-c", ev], capture_output=True)
        task_ms = {}
        for line in raw.stdout.decode().splitlines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                task_ms[e["Stage ID"]] = task_ms.get(e["Stage ID"], 0) + (
                    m.get("Executor Run Time", 0))
            elif e.get("Event") == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                if si.get("Submission Time"):
                    stages.append((si["Submission Time"],
                                   si.get("Completion Time"),
                                   si["Stage ID"], si["Number of Tasks"]))
        for name, ws in windows.items():
            walls, sums = [], []
            for w0, w1 in ws:
                wall = (w1 - w0) / 1000.0
                ssum = sum(task_ms.get(sid, 0)
                           for sub, comp, sid, _ in stages
                           if sub >= w0 and comp <= w1) / 1000.0
                walls.append(wall)
                sums.append(ssum)
            print(f"{name:22s} wall_min={min(walls):6.2f}s "
                  f"task_sum_med={statistics.median(sums):7.1f}s "
                  f"walls={[round(w,2) for w in walls]} "
                  f"sums={[round(s,1) for s in sums]}")
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
