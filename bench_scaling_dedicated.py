"""Dedicated fresh-session scaling rows: each (query, cores, pass) runs in
its own JVM (the full-suite worker runs minhash after three 1G-row queries
in one 48GB JVM; accumulated heap/GC state depressed its 32-core side).
Same methodology otherwise: warm + best-of-REPS, passes alternate core
counts, same deterministic inputs."""
import json, os, subprocess, sys

WORKER = """
import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from zcurve_spark.session import get_spark
from zcurve_spark.functions.columns import zkey2_col
from zcurve_spark.operators.bbox import bucketed_intervals_df, bbox_join_bucketed, count_hits
from zcurve_spark.operators.dedup import minhash_lsh_pairs
from zcurve_spark.sources.points import boxes_df, BITS, DOMAIN
from bench import _boxes
from zcurve_spark.util import fan_out

CORES = int(os.environ["SC_CORES"]); Q = os.environ["SC_Q"]
N = int(os.environ["SC_N"]); REPS = 2
spark = get_spark(app="zcurve-scaling-dedicated", cores=CORES, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

if Q == "compute_ref":
    def fn():
        h = F.col("id")
        for _ in range(4): h = F.xxhash64(h)
        return spark.range(0, 2_000_000_000, 1, 128).select(F.avg(h)).collect()[0][0]
elif Q == "bbox_batch":
    df = spark.range(0, N, 1, 128)
    x = ((F.col("id") * 2654435761) % DOMAIN).alias("x")
    y = ((F.col("id") * 2246822519 + 1013904223) % DOMAIN).alias("y")
    pts = df.select(F.col("id").alias("pid"), x, y).withColumn("zkey", zkey2_col("x", "y"))
    boxes = _boxes(200)
    bdf = boxes_df(spark, boxes)
    bivs, shift = bucketed_intervals_df(spark, boxes, bits=BITS, budget=16)
    def fn():
        hits = count_hits(bdf, bbox_join_bucketed(pts, bdf, bivs, shift))
        return hits.agg(F.sum("n_hits")).collect()[0][0]
elif Q == "minhash_dedup":
    docs = fan_out(spark.read.parquet("/tmp/zcurve_stage/docs_x512"))
    def fn():
        spark.catalog.clearCache()
        return minhash_lsh_pairs(docs, verify_min_jaccard_milli=100).count()

import time
fn()
best = 1e9
for _ in range(REPS):
    t0 = time.time(); fn(); best = min(best, time.time() - t0)
print(json.dumps({"q": Q, "cores": CORES, "t": round(best, 3)}))
"""

def run(q, cores, n=0):
    env = dict(os.environ, SC_CORES=str(cores), SC_Q=q, SC_N=str(n))
    out = subprocess.run([sys.executable, "-c", WORKER], env=env,
                         capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:]); raise SystemExit(1)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["t"]

results = {}
# alternate passes: lo, hi, lo, hi per row; min-merge
JOBS = [
    ("bbox_batch", 2, 500_000_000), ("bbox_batch", 8, 500_000_000),
    ("bbox_batch_wide", 8, 2_000_000_000), ("bbox_batch_wide", 32, 2_000_000_000),
    ("minhash_dedup", 8, 0), ("minhash_dedup", 32, 0),
    ("compute_ref", 2, 0), ("compute_ref", 8, 0), ("compute_ref", 32, 0),
]
for _pass in range(2):
    for name, cores, n in JOBS:
        q = "bbox_batch" if name.startswith("bbox") else name
        t = run(q, cores, n)
        key = (name, cores)
        results[key] = min(results.get(key, 1e9), t)
        print(f"pass{_pass} {name}@{cores}: {t}", file=sys.stderr, flush=True)
print(json.dumps({f"{k[0]}@{k[1]}": v for k, v in sorted(results.items())}))
