"""Two-point scaling draw for the heavy families (VERDICT r6 #8).

SCALE.md argues the dedup / ANN / pipeline families scale linearly from
their plan shapes (bucketed equality joins, banded LSH, partition-pruned
probes). This script turns that into two measured points: each listed
query runs at sf0.1 and at a 10x replication of sf0.1 (documents and
embeddings unioned 10 times with offset ids — same distribution, 10x
rows), and the JSON records the per-query time ratio. A family whose
plan were secretly quadratic in corpus size would show a ~100x ratio;
bucketed plans land near 10x (modulo fixed overhead amortizing DOWN).

The replicated corpus is bench-only derived data written under /tmp —
the driver's immutable sf dirs are never touched. Replicas are
PERTURBED, not verbatim: each replica's text gets a per-replica vowel
rotation (so its shingles, and therefore MinHash/SimHash signatures,
differ from every other replica's) and each embedding a per-replica
cyclic index shift (cosine of a random vector with its shift ≈ 0).
A verbatim copy would make every original doc a 10-way duplicate
group, growing candidate PAIRS quadratically in the replica count —
the first run of this harness measured exactly that (LSH ratios ~16×
at 10× rows, all of it real pair output, none of it plan shape).
Perturbation keeps the within-replica duplicate structure identical to
the base corpus, so 10× rows means 10× work for a linear plan.

Usage: python tools/bench_scale_heavy.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10

#: heavy-family queries whose linearity SCALE.md claims (stable names)
QUERIES = (
    "dedup_exact_survivors",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_neardup",
    "knn_ivf_probe",
    "knn_sketch_probe",
    "text_quality_score",
    "pipeline_training_data",
    # round 8: the star-CC kernel (O(log n) rounds — time should grow ~
    # linearly in edges, rounds only logarithmically), a spread()-patched
    # scan-parallel text query, and the single-pass profiler
    "dedup_cluster_star",
    "text_pii_scrub",
    "embedding_pca_contract",
)


def _build_scaled_dir(spark) -> str:
    from pyspark.sql import functions as F

    from connected_data_lake_spark.sources.tables import TABLE_NAMES, load_table

    out = os.path.join(tempfile.gettempdir(), "cdl_scale10_corpus")
    if os.path.isfile(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    docs = load_table(spark, SF_BASE, "documents")
    emb = load_table(spark, SF_BASE, "embeddings")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vecs = emb.agg(F.max("vec_id")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))
    # per-replica vowel rotation: replica k's words (hence shingles) differ
    # from every other replica's, so no cross-replica LSH collisions
    vowel_perms = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
                   "aeiuo", "eiuoa", "iuoae", "uoaei", "oaeiu"]
    text_perturbed = F.col("text")
    for k, perm in enumerate(vowel_perms[:REPLICAS]):
        if k == 0:
            continue
        text_perturbed = F.when(
            F.col("_rep") == k, F.translate(F.col("text"), "aeiou", perm)
        ).otherwise(text_perturbed)
    docs.crossJoin(reps).withColumn(
        "doc_id", F.col("doc_id") + F.col("_rep") * n_docs
    ).withColumn("text", text_perturbed).drop("_rep").write.parquet(
        os.path.join(out, "documents.parquet")
    )
    # per-replica cyclic shift: a random vector is ~orthogonal to its own
    # shift, so replicas never form cross-replica near-dup pairs while the
    # within-replica pairwise structure is preserved exactly
    shifted = F.expr(
        "transform(sequence(0, size(embedding) - 1), "
        "i -> element_at(embedding, "
        "CAST((i + _rep * 7) % size(embedding) AS INT) + 1))"
    )
    emb.crossJoin(reps).withColumn(
        "vec_id", F.col("vec_id") + F.col("_rep") * n_vecs
    ).withColumn("embedding", shifted).drop("_rep").write.parquet(
        os.path.join(out, "embeddings.parquet")
    )
    # non-corpus tables pass through so load_table resolves every name
    for name in TABLE_NAMES:
        if name in ("documents", "embeddings"):
            continue
        src = os.path.join(SF_BASE, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isfile(src):
            shutil.copy(src, dst)
        elif os.path.isdir(src):
            shutil.copytree(src, dst)
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> None:
    from connected_data_lake_spark.plans import spec_of
    from connected_data_lake_spark.session import get_spark

    spark = get_spark("cdl-scale-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = _build_scaled_dir(spark)

    def timed(spec, sf_dir: str, runs: int = 3) -> float:
        import statistics

        def once() -> float:
            t = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t
            spark.catalog.clearCache()
            return elapsed

        once()  # warm-up
        return round(statistics.median(once() for _ in range(runs)), 3)

    record: dict[str, object] = {
        "metric": "heavy_family_scaling",
        "base_dir": SF_BASE,
        "replicas": REPLICAS,
        "queries": {},
    }
    for name in QUERIES:
        spec = spec_of(name)
        base = timed(spec, SF_BASE)
        big = timed(spec, scaled)
        record["queries"][name] = {
            "base_sec": base,
            "x10_sec": big,
            "ratio": round(big / base, 2) if base else None,
        }
        print(f"# {name}: {base}s -> {big}s ({record['queries'][name]['ratio']}x)")

    line = json.dumps(record)
    print(line)
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
