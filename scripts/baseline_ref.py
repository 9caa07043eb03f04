#!/usr/bin/env python3
"""Measured reference baseline (BASELINE.json 'measured' block): time
the reference architecture's TRANSFORM shape on our own test data, so
bench_vs_baseline finally has a number instead of a pinned 1.0.

The reference's YFinance transform (TransForm_Load_Yfinance.py:170-349,
studied for behavior only — this file shares no code with it) is a
DRIVER-SIDE LOOP over stocks: for each entity it filters/reads that
entity's rows, computes a daily distinct pass plus monthly and yearly
aggregations (avg/sum/max/min/stddev + count per grain), and writes
each result out. One Spark job chain per entity is its scale ceiling —
the engine expresses the same three grains as ONE grouped plan over
all entities (graft.operators.Rollups), so the comparison below is the
architectural claim itself, measured.

Shape fidelity / charity notes (every divergence favors the REFERENCE):
 - The Mongo writes are replaced by .count() materializations
   (MongoDB is not in this environment); real writes only add I/O.
 - The reference re-reads each stock's collection from MongoDB; here
   each iteration filters one parquet file with a pushed-down
   entity predicate — strictly cheaper.
 - Its session configs that transfer (shuffle.partitions=4 — tuned for
   per-entity micro-frames) are kept; local[*] uses all 32 cores.
 - The loop is timed over the first K entities and extrapolated
   linearly. Flat per-entity cost is MEASURED, not assumed: a second
   timed window at 3K entities reports the per-entity delta
   (per_entity_sec_k vs per_entity_sec_3k and linearity_pct), so the
   extrapolation's premise is in the artifact. Fixed session overheads
   amortize identically in both windows (both run after the untimed
   warm iteration).

Usage: python3 scripts/baseline_ref.py [K] [sf_dir]
Prints one JSON line; merge into BASELINE.json under "measured".
"""
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def grain_agg(df, period_col):
    return df.groupBy(period_col).agg(
        F.avg("value"), F.sum("value"), F.max("value"), F.min("value"),
        F.stddev("value"), F.count("*"))


def main():
    spark = (SparkSession.builder.master("local[*]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "value")
    # two timing windows (K and 3K entities) substantiate the linear
    # extrapolation: if per-entity cost is flat, the two windows' rates
    # agree and linearity_pct ≈ 100
    entities = [r[0] for r in
                ev.select("user_id").distinct().orderBy("user_id").head(3 * K)]
    n_entities = ev.select("user_id").distinct().count()

    # warm one full iteration (JIT/codegen), untimed — the reference's
    # steady-state per-stock cost is what extrapolates
    def one_entity(uid):
        e = ev.filter(F.col("user_id") == uid)
        e.select(F.date_format("ts", "yyyy-MM-dd").alias("period_key"),
                 "value").distinct().count()
        grain_agg(e.withColumn("p", F.date_format("ts", "yyyy-MM")), "p").count()
        grain_agg(e.withColumn("p", F.year("ts")), "p").count()

    one_entity(entities[0])
    t0 = time.time()
    for uid in entities[:K]:
        one_entity(uid)
    loop_k_sec = time.time() - t0
    t1 = time.time()
    for uid in entities[K:]:
        one_entity(uid)
    loop_rest_sec = time.time() - t1
    loop_sec = loop_k_sec + loop_rest_sec
    timed = min(3 * K, len(entities))
    # divide each window by the entities it ACTUALLY timed: with fewer
    # than K distinct entities the first window holds them all and the
    # tail is empty — dividing by K (and min-ing with a 0-rate empty
    # tail) would publish extrapolated_full_sec = 0, a degenerate
    # baseline artifact
    per_entity_k = loop_k_sec / max(1, min(K, timed))
    has_tail = timed > K
    per_entity_tail = (loop_rest_sec / (timed - K)) if has_tail else None
    # charity rule: every divergence favors the REFERENCE — extrapolate
    # from the CHEAPER window's rate (in practice the tail: the first-K
    # window still carries residual JIT warm-up, so a blended rate
    # would overstate the reference's cost). No tail window → the
    # first-window rate stands alone and linearity is unmeasured.
    per_entity = min(per_entity_k, per_entity_tail) if has_tail else per_entity_k
    linearity_pct = round(100.0 * per_entity_tail / per_entity_k, 1) \
        if has_tail and per_entity_k > 0 else None
    print(json.dumps({
        "metric": "reference_transform_loop",
        "sf": SF,
        "entities_timed": timed,
        "entities_total": n_entities,
        "loop_sec": round(loop_sec, 2),
        "per_entity_sec_first_k": round(per_entity_k, 4),
        "per_entity_sec_tail_2k":
            round(per_entity_tail, 4) if has_tail else None,
        "linearity_pct": linearity_pct,
        "per_entity_sec": round(per_entity, 4),
        "extrapolated_full_sec": round(per_entity * n_entities, 1),
        "extrapolated": True,
        "note": "per-stock driver loop (reference transform shape), "
                "Mongo writes replaced by counts (favors the reference); "
                "extrapolation rate = min of the first-K and tail-2K "
                "window rates (charity: residual JIT warm-up in the "
                "first window must not inflate the reference's cost); "
                "linearity_pct = tail/first rate (<100 = warm-up decay, "
                "~100 = flat steady state); compare to the engine's "
                "one-plan rollup_daily/monthly/yearly times in BENCH_FULL",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
