"""Round-7 optimization instrumentation (guide §1) — NOT the frozen bench.

Measures, per headline query: warm-rep median latency, Spark job count
per invocation, and dumps .explain("formatted") to plans/r07/.
Separately times the 240k index build (bench-identical methodology).

Usage:
  python bench_extra.py queries [before|after] [name ...]
  python bench_extra.py build   [runs]
  python bench_extra.py noop    [before|after] [name ...]   # noop-sink isolation

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from elasticsearch_assets_spark.corpus import generate_corpus
from elasticsearch_assets_spark.indexing.build import build_and_write_index
from elasticsearch_assets_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCHX_REPS", "5"))

HEADLINE = [
    "ft_match_or", "ft_match_and", "ft_phrase", "ft_bool_must_not",
    "ft_wildcard_prefix", "ev_range_scan", "ev_date_histogram",
    "ev_geo_distance", "dd_exact", "dd_minhash_lsh", "ts_quality",
    "sim_cosine_topk",
]


def cpu_probe(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 4_000_000, 1, 2).selectExpr(
        "max(md5(cast(id AS string))) AS h"
    ).collect()
    return time.perf_counter() - t0


def _stage_sf(sf_dir: str) -> str:
    """tmpfs-stage the input like bench.py does (measure engine, not disk)."""
    if os.environ.get("BENCHX_STAGE", "1") == "0" or not os.path.isdir("/dev/shm"):
        return sf_dir
    shm_base = tempfile.mkdtemp(prefix="benchx_shm_", dir="/dev/shm")
    os.environ["TMPDIR"] = shm_base
    tempfile.tempdir = None
    staged = os.path.join(shm_base, "sf_input")
    shutil.copytree(sf_dir, staged)
    return staged


def _job_count(sc, fn):
    """Run fn inside a unique job group; return (#jobs, result)."""
    gid = f"bx_{time.time_ns()}"
    sc.setJobGroup(gid, gid)
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc._jsc.sc().statusTracker()
    ids = tracker.getJobIdsForGroup(gid)
    return len(ids), out


def run_queries(tag: str, names: list[str], sink: str = "count") -> None:
    sf_dir = _stage_sf(SF_DIR)
    spark = get_spark(app_name="bench_extra", cpus=CPUS)
    sc = spark.sparkContext
    t0 = time.time()
    entrymod._docs_index(spark, sf_dir)
    serving = time.time() - t0
    qs = entrymod.queries()
    names = names or [n for n in HEADLINE if n in qs]
    os.makedirs("plans/r07", exist_ok=True)
    out: dict = {"tag": tag, "sink": sink, "sf": SF_DIR, "serving_build_sec": round(serving, 2)}
    probes = [cpu_probe(spark)]
    res = {}
    for name in names:
        sc.setJobDescription(f"bx:{name}")
        df = qs[name](spark, sf_dir)
        # plan dump (the bench-timed frame)
        plan = df._jdf.queryExecution().explainString(
            sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        times, jobs = [], []
        for rep in range(REPS + 1):
            t0 = time.perf_counter()
            if sink == "noop":
                nj, _ = _job_count(sc, lambda: qs[name](spark, sf_dir)
                                   .write.format("noop").mode("overwrite").save())
            else:
                nj, _ = _job_count(sc, lambda: qs[name](spark, sf_dir).count())
            dt = time.perf_counter() - t0
            if rep > 0:
                times.append(dt)
                jobs.append(nj)
        res[name] = {"median_sec": round(statistics.median(times), 3),
                     "min_sec": round(min(times), 3),
                     "jobs": max(jobs)}
        print(f"{name}: {res[name]}", file=sys.stderr)
    probes.append(cpu_probe(spark))
    out["queries"] = res
    out["sum_median_sec"] = round(sum(v["median_sec"] for v in res.values()), 3)
    out["cpu_probe_sec"] = [round(p, 3) for p in probes]
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


def run_build(runs: int) -> None:
    sf_dir = _stage_sf(SF_DIR)  # sets TMPDIR to tmpfs
    docs_n = int(os.environ.get("BENCH_DOCS", "240000"))
    spark = get_spark(app_name="bench_extra_build", cpus=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "1m"})
    tmp = tempfile.mkdtemp(prefix="benchx_idx_")
    corpus_path = os.path.join(tmp, "corpus")
    generate_corpus(spark, docs_n, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    # warm-up
    build_and_write_index(docs, os.path.join(tmp, "idx_warm"), n_buckets=32)
    shutil.rmtree(os.path.join(tmp, "idx_warm"), ignore_errors=True)
    times, probes = [], []
    for r in range(runs):
        probes.append(round(cpu_probe(spark), 3))
        t0 = time.time()
        build_and_write_index(spark.read.parquet(corpus_path),
                              os.path.join(tmp, f"idx_{r}"), n_buckets=32)
        times.append(round(time.time() - t0, 2))
        shutil.rmtree(os.path.join(tmp, f"idx_{r}"), ignore_errors=True)
        print(f"build run {r}: {times[-1]}s (probe {probes[-1]})", file=sys.stderr)
    probes.append(round(cpu_probe(spark), 3))
    med = statistics.median(times)
    print(json.dumps({
        "docs": docs_n, "runs_sec": times, "median_sec": med,
        "docs_per_sec": round(docs_n / med, 1), "cpu_probe_sec": probes,
        "loadavg_1m": round(os.getloadavg()[0], 2)}))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "build":
        run_build(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif mode == "noop":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        run_queries(tag, sys.argv[3:], sink="noop")
    else:
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        run_queries(tag, sys.argv[3:])
