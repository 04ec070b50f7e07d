#!/usr/bin/env python
"""Per-stage profile of the minhash dedup pipeline at two core counts
(r4 VERDICT #2: minhash 8->32 scaling sat at 0.73 of the measured host
ceiling; find WHICH stage stops scaling).

Stages (cumulative where noted — each isolates one pipeline segment):

  compute_ref   pure-codegen calibration (the host ceiling)
  shingle_udf   corpus -> Arrow shingling UDF -> sum(size) (no shuffle)
  signatures    shingle -> explode -> hash -> groupBy(id) 32 min-aggs
  band_cand     + band explode + self-join + dropDuplicates (verify off)
  ids_bucket    the semi-join's extra pass: groupBy(band,bh) bound
  full_semi     the shipped scale config (verify=100, semijoin=True)
  full_plain    corpus-wide verify joins (semijoin=False)

Each core count runs in its OWN JVM (heap state from a previous width
depresses later rows — measured in r3) with warm + best-of-REPS.
Appends one line per run to scaling_pairs.jsonl (tagged
kind=minhash_profile) and prints a summary table.

Env: SPARK_GRAFT_PROFILE_CORES (default "8,32"),
     SPARK_GRAFT_SCALE_DOCMULT (default 512),
     SPARK_GRAFT_PROFILE_REPS (default 2),
     SPARK_GRAFT_PROFILE_STAGES (comma filter, default all),
     SPARK_GRAFT_PROFILE_PIN=1 -> taskset-pin each width's WHOLE process
     tree (JVM + Python workers) to that many host CPUs.  Unpinned
     local[N] task slots spawn Python workers that borrow the host's
     idle cores, subsidizing the *small* width of a scaling pair —
     a real cluster executor owns exactly its cores, so the PINNED
     pair is the honest N -> 4N analog for Python-heavy stages.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CORES = [int(c) for c in os.environ.get("SPARK_GRAFT_PROFILE_CORES", "8,32").split(",")]
DOC_MULT = int(os.environ.get("SPARK_GRAFT_SCALE_DOCMULT", "512"))
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))

WORKER = """
import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from zcurve_spark.session import get_spark
from zcurve_spark.operators.dedup import (
    minhash_lsh_pairs, distinct_ngrams_arrow, MERSENNE,
)
from zcurve_spark.util import fan_out
from bench import amplify_docs

CORES = int(os.environ["MP_CORES"])
MULT = int(os.environ["MP_MULT"])
REPS = int(os.environ["MP_REPS"])
spark = get_spark(app="minhash-profile", cores=CORES, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

p = f"/tmp/zcurve_stage/docs_x{MULT}"
if not os.path.exists(p + "/_SUCCESS"):
    amplify_docs(
        fan_out(spark.read.parquet("/root/testdata/sf0.1/documents.parquet")), MULT
    ).write.mode("overwrite").parquet(p)

def docs():
    return fan_out(spark.read.parquet(p))

STAGES = set(s for s in os.environ.get("MP_STAGES", "").split(",") if s)
timings = {}
def run(name, fn):
    if STAGES and name not in STAGES:
        return
    fn()
    best = None
    for _ in range(REPS):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings[name] = round(best, 3)
    print(f"  [{CORES}] {name}: {timings[name]}s", file=sys.stderr, flush=True)

def compute_ref():
    h = F.col("id")
    for _ in range(4):
        h = F.xxhash64(h)
    return spark.range(0, 2_000_000_000, 1, 128).select(F.avg(h)).collect()[0][0]
run("compute_ref", compute_ref)

def shingle_udf():
    return docs().select(
        F.size(distinct_ngrams_arrow("text", 3)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
run("shingle_udf", shingle_udf)

def _exploded():
    return docs().select(
        F.col("doc_id").alias("id"),
        F.explode(distinct_ngrams_arrow("text", 3)).alias("gram"),
    ).withColumn("h", F.pmod(F.xxhash64("gram"), F.lit(MERSENNE)))

def signatures():
    aggs = [
        F.min((F.col("h") * F.lit(2 * i + 1)
               + F.lit(0x9E3779B9 * (i + 1) & ((1 << 30) - 1))) % F.lit(MERSENNE)
        ).alias(f"_m{i}")
        for i in range(32)
    ]
    return _exploded().groupBy("id").agg(*aggs).count()
run("signatures", signatures)

def band_cand():
    return minhash_lsh_pairs(docs(), verify_min_jaccard_milli=None).count()
run("band_cand", band_cand)

def ids_bucket():
    sig = _exploded().groupBy("id").agg(
        *[F.min((F.col("h") * F.lit(2 * i + 1)
                 + F.lit(0x9E3779B9 * (i + 1) & ((1 << 30) - 1))) % F.lit(MERSENNE)
          ).alias(f"_m{i}") for i in range(32)]
    ).select("id", F.array(*[f"_m{i}" for i in range(32)]).alias("sig"))
    bands = sig.select("id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.element_at("sig", b * 4 + r + 1) for r in range(4)]).alias("bh"))
        for b in range(8)
    ])).alias("bs")).select("id", "bs.band", "bs.bh")
    return (bands.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("m"))
            .filter(F.col("m") >= 2)
            .agg(F.coalesce(F.sum("m"), F.lit(0))).collect()[0][0])
run("ids_bucket", ids_bucket)

def full_semi():
    return minhash_lsh_pairs(docs(), verify_min_jaccard_milli=100,
                             verify_semijoin=True).count()
run("full_semi", full_semi)

def full_plain():
    return minhash_lsh_pairs(docs(), verify_min_jaccard_milli=100,
                             verify_semijoin=False).count()
run("full_plain", full_plain)

spark.stop()
print(json.dumps({"cores": CORES, "timings": timings}))
"""


def run_at(cores: int) -> dict:
    env = dict(
        os.environ,
        MP_CORES=str(cores),
        MP_MULT=str(DOC_MULT),
        MP_REPS=str(REPS),
        MP_STAGES=os.environ.get("SPARK_GRAFT_PROFILE_STAGES", ""),
    )
    cmd = [sys.executable, "-c", WORKER]
    if os.environ.get("SPARK_GRAFT_PROFILE_PIN") == "1":
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True,
        cwd="/root/repo", timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"profile worker at {cores} cores failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["timings"]


def main() -> None:
    by_cores = {}
    # alternate passes (lo, hi, lo, hi) so a host burst cannot bias one
    # side; keep per-query min
    n_passes = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "2"))
    for _pass in range(n_passes):
        for c in CORES:
            t = run_at(c)
            if c in by_cores:
                by_cores[c] = {k: min(by_cores[c][k], t[k]) for k in t}
            else:
                by_cores[c] = t
    lo, hi = CORES[0], CORES[-1]
    ratio = hi / lo
    cal = (by_cores[lo]["compute_ref"] / by_cores[hi]["compute_ref"]) / ratio
    rows = []
    for q in by_cores[lo]:
        sp = by_cores[lo][q] / by_cores[hi][q]
        eff = sp / ratio
        rows.append((q, by_cores[lo][q], by_cores[hi][q], round(sp, 2),
                     round(eff, 3), round(eff / cal, 3)))
    print(f"{'stage':14} {lo:>6} {hi:>7} {'x':>6} {'eff':>6} {'eff/cal':>8}")
    for r in rows:
        print(f"{r[0]:14} {r[1]:6.2f} {r[2]:7.2f} {r[3]:6.2f} {r[4]:6.3f} {r[5]:8.3f}")
    rec = {
        "kind": "minhash_profile", "lo": lo, "hi": hi, "doc_mult": DOC_MULT,
        "reps": REPS, "cal": round(cal, 3),
        "pinned": os.environ.get("SPARK_GRAFT_PROFILE_PIN") == "1",
        "stages_filter": os.environ.get("SPARK_GRAFT_PROFILE_STAGES", ""),
        "t_lo": by_cores[lo], "t_hi": by_cores[hi],
        "rows": rows,
    }
    with open("/root/repo/scaling_pairs.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps({"metric": "minhash_profile", "cal": rec["cal"],
                      "rows": {r[0]: r[5] for r in rows}}))


if __name__ == "__main__":
    main()
