"""Decompose text_quality_score's 10x-scaling ratio (VERDICT r9 #6).

BENCH_SCALE.json shows text_quality_score at 6.68x for 10x data — sublinear,
so no scale risk, but the growth TERM was never named with measurements the
way the minhash entry was. The claim to check: cost(n) = F + L*n, i.e. a
fixed per-query overhead (job scheduling + scan setup + Arrow batch spin-up)
plus a linear regex/CPU term over the corpus. Two points always fit a
two-parameter model, so this harness measures a THIRD point (4x) and
reports the model's prediction error there: a real quadratic term would
overshoot the interpolated 4x point visibly (for reference, adding a
quadratic term q*n^2 that explains even 20% of the 10x cost would make the
4x prediction ~25% too fast).

Corpus replication matches tools/bench_scale_heavy.py (per-replica vowel
rotation, documents only — the query reads nothing else).

Usage: python tools/decompose_quality_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VOWEL_PERMS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
               "aeiuo", "eiuoa", "iuoae", "uoaei", "oaeiu"]


def _build_docs_dir(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    from connected_data_lake_spark.sources.tables import TABLE_NAMES, load_table

    out = os.path.join(tempfile.gettempdir(), f"cdl_scale{replicas}_docs")
    if os.path.isfile(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    docs = load_table(spark, SF_BASE, "documents")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(replicas).select(F.col("id").alias("_rep"))
    text = F.col("text")
    for k, perm in enumerate(VOWEL_PERMS[:replicas]):
        if k:
            text = F.when(
                F.col("_rep") == k, F.translate(F.col("text"), "aeiou", perm)
            ).otherwise(text)
    docs.crossJoin(reps).withColumn(
        "doc_id", F.col("doc_id") + F.col("_rep") * n_docs
    ).withColumn("text", text).drop("_rep").write.parquet(
        os.path.join(out, "documents.parquet")
    )
    for name in TABLE_NAMES:
        if name == "documents":
            continue
        src = os.path.join(SF_BASE, f"{name}.parquet")
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(out, f"{name}.parquet"))
        elif os.path.isdir(src):
            shutil.copytree(src, os.path.join(out, f"{name}.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> None:
    from connected_data_lake_spark.plans import spec_of
    from connected_data_lake_spark.session import get_spark

    spark = get_spark("cdl-quality-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spec = spec_of("text_quality_score")

    def timed(sf_dir: str, runs: int = 5) -> float:
        def once() -> float:
            t = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df._jdf.queryExecution().executedPlan().execute().count()
            elapsed = time.perf_counter() - t
            spark.catalog.clearCache()
            return elapsed

        once()  # warm-up
        return round(statistics.median(once() for _ in range(runs)), 3)

    points = {1: timed(SF_BASE)}
    for n in (4, 10):
        points[n] = timed(_build_docs_dir(spark, n))

    # fit F + L*n from the endpoints, judge at the held-out middle point
    t1, t4, t10 = points[1], points[4], points[10]
    lin = (t10 - t1) / 9.0
    fixed = t1 - lin
    pred4 = fixed + 4 * lin
    out = {
        "metric": "text_quality_score_growth_decomposition",
        "base_dir": SF_BASE,
        "seconds": {str(k): v for k, v in points.items()},
        "fixed_overhead_sec": round(fixed, 3),
        "linear_sec_per_base_corpus": round(lin, 3),
        "ratio_10x": round(t10 / t1, 2),
        "predicted_4x_sec": round(pred4, 3),
        "prediction_error_pct_at_4x": round(100 * (t4 - pred4) / t4, 1),
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
