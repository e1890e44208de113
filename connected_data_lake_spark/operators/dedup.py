"""Deduplication operators for training-data pipelines.

Four families, each a pure DataFrame transform (no driver-side loops, no
Python UDFs — everything shuffles on keys and scales horizontally):

- exact:      md5 fingerprint of normalized text → hash groupBy
- MinHash+LSH: shingle → k minhashes → banded bucket join → candidate pairs
               → exact Jaccard verification
- SimHash:    64-bit bit-vote signature → chunk-banded candidates → Hamming
- embedding:  random-hyperplane LSH buckets → in-bucket cosine pairs

Scale notes: all-pairs comparison is never materialized; candidates come
from equality joins on (band, hash) buckets, so cost is O(collisions), not
O(n²). Signatures are computed in one scan with higher-order functions.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connected_data_lake_spark.functions import text as TX
from connected_data_lake_spark.functions import vectors as VX


#: OPT-IN registry of every index relation persisted (or
#: localCheckpoint'ed) by an operator in this process, until released.
#: The per-result ``_cdl_persisted`` attribute is lost as soon as a caller
#: wraps the result (``.orderBy(...)`` returns a fresh DataFrame), so a
#: suite runner that must release per-query caches between timed runs
#: (bench.py) enables :func:`track_session_indexes` and drains THIS
#: registry instead — a proper ``DataFrame.unpersist`` per entry, which
#: drops the CacheManager entry AND storage (a storage-only sweep left
#: stale entries whose unmaterialized relations re-ran lineage per
#: consumer; measured 4.4 -> 22 s). Tracking is OFF by default (ADVICE
#: r9): a long-lived library consumer that never calls
#: ``release_session_indexes`` must not accumulate strong DataFrame
#: references here — plain use keeps the attach-to-result-only behavior.
_LIVE_INDEX_RELATIONS: list[DataFrame] = []
_TRACK_SESSION_INDEXES = False


def track_session_indexes(enabled: bool = True) -> None:
    """Turn the session-wide index registry on/off (default off).

    Suite runners with a between-runs release cadence (bench.py) enable
    it so :func:`release_session_indexes` can free every operator-built
    cache regardless of caller-side wrapping; plain library sessions
    leave it off and release via :func:`release_index` on results they
    still hold (or let Spark's LRU evict)."""
    global _TRACK_SESSION_INDEXES
    _TRACK_SESSION_INDEXES = enabled
    if not enabled:
        _LIVE_INDEX_RELATIONS.clear()


def _with_persisted(out: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Attach the persisted index relations backing ``out`` so callers can
    release them: ``release_index(df)`` unpersists after materialization.
    Long-lived sessions that re-run an index build without releasing the
    previous one would otherwise accumulate cached blocks until eviction.
    When session tracking is enabled, each relation is also recorded in
    :data:`_LIVE_INDEX_RELATIONS` (see :func:`release_session_indexes`)."""
    out._cdl_persisted = list(persisted)  # type: ignore[attr-defined]
    if _TRACK_SESSION_INDEXES:
        _LIVE_INDEX_RELATIONS.extend(persisted)
    return out


def register_persist(df: DataFrame) -> DataFrame:
    """Record a persisted/checkpointed relation for session-wide release
    (operators that RETURN a block-backed relation — connected-components
    labels, pagerank ranks — register it here so bench can free it).
    No-op unless :func:`track_session_indexes` enabled the registry."""
    if _TRACK_SESSION_INDEXES:
        _LIVE_INDEX_RELATIONS.append(df)
    return df


def release_index(df: DataFrame) -> None:
    """Unpersist the cached index relations attached by the dedup/ANN
    operators (no-op for DataFrames without one)."""
    for p in getattr(df, "_cdl_persisted", ()):  # pragma: no branch
        p.unpersist()
        try:
            _LIVE_INDEX_RELATIONS.remove(p)
        except ValueError:
            pass


def release_session_indexes() -> None:
    """Unpersist EVERY index relation recorded since the last release.

    The between-runs hook for suite runners: unlike ``release_index`` it
    does not depend on the result DataFrame still carrying its attachment
    through caller-side wrapping."""
    while _LIVE_INDEX_RELATIONS:
        _LIVE_INDEX_RELATIONS.pop().unpersist()


def spread(df: DataFrame, *key_cols: str, width: int | None = None) -> DataFrame:
    """Hash-repartition an index-build input across the full cluster
    parallelism when it arrives under-partitioned.

    Signature generation (pandas-UDF batches) and bucket-join probes
    parallelize per partition, so a corpus that arrives in a handful of
    input splits — one small parquet file locally, a skewed ingest layout
    on a cluster — serializes the whole dedup/ANN family onto those few
    cores. One cheap row-sized shuffle before the expensive per-row work
    is the scale-correct trade at every size (measured: the sf0.1
    documents table reads as ONE split and single-cores a ~25M-probe
    SimHash chunk join). Already-wide inputs pass through untouched.

    Width is estimated from ``df.inputFiles()`` (a catalog/listing lookup —
    no job, no RDD lineage materialization; ``df.rdd.getNumPartitions()``
    forced a full physical-planning pass per operator call). The file count
    under-estimates splits of files larger than maxPartitionBytes, so the
    worst case is one redundant narrow shuffle — the cheap side of the
    trade. Callers that know better pass ``width=`` explicitly; non-file
    inputs (memory relations) estimate 0 and get spread, which is safe."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if width is None:
        try:
            width = len(df.inputFiles())
        except Exception:  # non-file-backed plan: assume narrow
            width = 0
    if width >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per normalized-text fingerprint (the min id — a
    deterministic survivor). One shuffle on the fingerprint."""
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    return (
        df.withColumn("_fp", TX.fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fingerprint groups with >1 member: (fingerprint, n_dups, keep_id)."""
    return (
        df.groupBy(TX.fingerprint(text_col).alias("fingerprint"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    text_col: str, num_hashes: int = 128, shingle_n: int = 3, seed: int = 42
) -> Column:
    """k-minhash signature (array<bigint>) over token n-gram shingles.

    Single-pass fold: each shingle string is hashed ONCE (xxhash64), then
    the k "permutations" are fixed-width rehashes ``xxhash64(h, i)`` and
    the fold keeps a running elementwise min. The shingle array and the
    per-shingle string hash are evaluated exactly once per row. (Two
    rejected alternatives: a nested
    transform(seeds, i -> min(transform(shingles, s -> hash(s, i))))
    re-evaluates the shingle expression per seed — measured 12x slower —
    and a linear mix ``min(a_i*h+b_i)`` without a modular wrap is
    monotonic in h, so every "permutation" would pick the same shingle.)

    NULL when the doc has < shingle_n tokens. ``seed`` reserved for a
    keyed family; the xxhash64 rehash is already seed-indexed.
    """
    sh = F.array_distinct(TX.shingles(text_col, shingle_n))
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # 2-arg transform lambda binds (element, index): the permutation index
    # comes for free instead of zipping against a seeds array (an outer
    # sequence() expression inside the lambda would be re-built per shingle)
    sig = F.aggregate(
        hashes,
        F.array_repeat(F.lit((1 << 63) - 1), num_hashes),
        lambda acc, h: F.transform(acc, lambda m, i: F.least(m, F.xxhash64(h, i + F.lit(seed)))),
    )
    return F.when(F.size(sh) > 0, sig)


def minhash_from_hashes(hashes_col: Column, num_hashes: int = 128, seed: int = 42) -> Column:
    """k-minhash signature from a precomputed per-shingle hash array: the k
    permutations run as one numpy broadcast per Arrow batch instead of
    k·|shingles| interpreted higher-order-function evaluations (which never
    reach whole-stage codegen; measured ~4x on the signature stage). Only
    int64→int64 mixing crosses to Python, so batch transfer is tiny.
    Permutation i = splitmix64 finalizer over
    (shingle_hash + (seed + i) · golden_gamma) — a bijective mix, so unlike
    a monotone linear map each permutation ranks shingles independently."""
    gamma = np.uint64(0x9E3779B97F4A7C15)
    seeds = (np.arange(num_hashes, dtype=np.uint64) + np.uint64(seed)) * gamma

    @F.pandas_udf("array<bigint>")
    def _mh(hashes: pd.Series) -> pd.Series:
        # One flattened (total_shingles, k) mix + segment-min per Arrow batch:
        # a per-row Python loop pays interpreter + small-matrix dispatch
        # overhead ~n_rows times per batch (measured ~1.7x slower at ~200
        # shingles/doc). np.minimum.reduceat needs non-empty segments, so
        # empty/None rows are masked out and scattered back as NULL.
        # The mix runs over ROW CHUNKS sized so the (chunk_shingles, k)
        # intermediate stays ~64 MB: a full 10k-row Arrow batch of ~200-
        # shingle docs would otherwise materialize a ~2 GB uint64 array per
        # worker (guide §4.2 bound-the-batch note) — per-doc results are
        # independent, so chunking is bit-identical.
        vals = hashes.to_numpy()
        lens = np.fromiter(
            (0 if h is None else len(h) for h in vals), dtype=np.int64, count=len(vals)
        )
        out: list = [None] * len(vals)
        nz = np.nonzero(lens > 0)[0]
        budget = max(1, (64 << 20) // (8 * num_hashes))  # shingles per chunk
        start = 0
        while start < len(nz):
            end = start
            tot = 0
            while end < len(nz) and (tot == 0 or tot + lens[nz[end]] <= budget):
                tot += lens[nz[end]]
                end += 1
            idx = nz[start:end]
            flat = np.concatenate([np.asarray(vals[i], dtype=np.uint64) for i in idx])
            with np.errstate(over="ignore"):
                x = flat[:, None] + seeds[None, :]
                x ^= x >> np.uint64(30)
                x *= np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(27)
                x *= np.uint64(0x94D049BB133111EB)
                x ^= x >> np.uint64(31)
            offsets = np.concatenate(([0], np.cumsum(lens[idx])[:-1]))
            mins = np.minimum.reduceat(x, offsets, axis=0).astype(np.int64)
            for j, i in enumerate(idx):
                out[i] = mins[j].tolist()
            start = end
        return pd.Series(out)

    return _mh(hashes_col)


def minhash_signature_vectorized(
    text_col: str, num_hashes: int = 128, shingle_n: int = 3, seed: int = 42
) -> Column:
    """Vectorized minhash signature — same contract as
    :func:`minhash_signature`; shingle hashing stays JVM-side
    (:func:`~connected_data_lake_spark.functions.text.shingle_hashes` —
    no shingle strings are built), the k-permutation mixing runs via
    :func:`minhash_from_hashes`. Hash family differs from
    minhash_signature's xxhash64(h, i); pick one per index build."""
    sh = F.array_distinct(TX.shingle_hashes(text_col, shingle_n))
    return minhash_from_hashes(sh, num_hashes, seed)


def shingle_relation(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh) — distinct HASHED token n-gram shingle sets (array<bigint>,
    :func:`~connected_data_lake_spark.functions.text.shingle_hashes`),
    persisted.

    The shared index-build step for every shingle-based dedup operator:
    signature generation AND exact-Jaccard verification both consume it, so
    computing it once per job halves the shingling+tokenization passes (the
    single most expensive expression in the dedup family). Hashing to longs
    BEFORE distinct/caching is the scale choice: distinct compares 8-byte
    words instead of strings, the cached relation is ~10x smaller, and
    signatures consume the hashes with no re-hash pass. Set arithmetic
    (distinct, intersect, Jaccard) over the hashes equals the string-set
    semantics up to negligible, corpus-deterministic 64-bit collisions.
    At cluster scale this relation is a written table; persist() plays that
    role here. Release with :func:`release_index` on the operator output.

    The empty-set filter runs on the TOKEN count (size(tokens) >= n ⟺
    size(sh) > 0 — a doc with ≥ n tokens always has ≥ 1 distinct shingle,
    NULL text tokenizes to NULL and is dropped by either form): a filter on
    the computed ``sh`` column is pushed below the projection by Catalyst,
    which re-evaluates the whole tokenize+hash fold a second time just for
    the size check (measured 0.22 → 0.74 s on the 5k-doc sf0.1 scan —
    the same expression-duplication trap as guide §4.4, for plain
    expressions instead of UDFs)."""
    return (
        spread(df, id_col)
        .filter(TX.has_tokens(text_col, shingle_n))
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(TX.shingle_hashes(text_col, shingle_n)).alias("sh"),
        )
        .persist()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
    with_est: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH:
    (id_a, id_b, est_jaccard) with id_a < id_b.

    bands×rows = num_hashes; a pair collides if any band's row-slice hashes
    equal. est_jaccard = fraction of equal signature positions. Pass a
    prebuilt ``shingles`` relation (:func:`shingle_relation`) to share the
    shingling pass with the verify step. ``with_est=False`` drops the
    est_jaccard column (and the signature re-attach joins that produce
    it) — the right call when the candidates feed an exact-Jaccard verify
    step that never reads the estimate.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands

    if shingles is None:
        shingles = shingle_relation(df, text_col, id_col, shingle_n)
    # Persist the signature relation: it is referenced by both sides of the
    # self-join AND by every band slice, and Catalyst's projection collapse
    # would otherwise inline (= recompute) the 128-hash expression per
    # reference — measured 20x slowdown without this. At cluster scale this
    # is the "build the MinHash index once" step; swap persist() for a
    # checkpoint/table write when signatures should survive the job.
    # No isNotNull filter on the UDF output: shingle_relation guarantees
    # non-empty shingle sets, so the signature is never NULL — and a filter
    # referencing the UDF column is pushed below the projection, making the
    # 128-permutation pandas UDF run TWICE (two ArrowEvalPython nodes, the
    # guide §4.4 duplication; measured ~2x the signature stage).
    sig = shingles.select(
        "id",
        minhash_from_hashes(F.col("sh"), num_hashes).alias("sig"),
    ).persist()
    # The self-joined band relation carries (id, band, band_hash) ONLY —
    # 24 bytes/row. An earlier shape exploded the 128-long signature array
    # through the band join (~1 KB × bands per doc on BOTH sides, ~40x the
    # shuffle bytes) so est could be computed per collision; the estimate
    # is now attached per DISTINCT surviving pair below, from the persisted
    # sig relation, which also evaluates the 128-position compare once per
    # pair instead of once per colliding band.
    bucketed = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "band_hash"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if with_est:
        est = F.size(
            F.filter(
                F.zip_with(
                    F.col("_sig_a"), F.col("_sig_b"), lambda x, y: (x == y).cast("int")
                ),
                lambda v: v == 1,
            )
        ).cast("double")
        pairs = (
            pairs.join(
                sig.select(F.col("id").alias("id_a"), F.col("sig").alias("_sig_a")),
                "id_a",
            )
            .join(
                sig.select(F.col("id").alias("id_b"), F.col("sig").alias("_sig_b")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.round(est / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
            )
        )
    return _with_persisted(pairs, sig, shingles)


def minhash_bands(
    shingles: DataFrame, num_hashes: int = 128, bands: int = 32
) -> DataFrame:
    """(id, band, band_hash) banded MinHash signatures of a
    :func:`shingle_relation` — the storable LSH index relation: each band's
    row-slice of the k-minhash signature collapses to one xxhash64 bucket
    key, so a written copy of this relation IS the corpus dedup index
    (write partitioned/bucketed by (band, band_hash) at cluster scale)."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands
    # no isNotNull filter on the UDF output — see minhash_lsh_candidates
    # (shingle_relation guarantees non-empty sets; the filter doubled the
    # signature UDF). NULL sigs MUST never reach the band explode here:
    # xxhash64(slice(NULL)) is a constant, so empty docs would all share
    # every band bucket — the shingle_relation invariant is load-bearing.
    sig = shingles.select(
        "id", minhash_from_hashes(F.col("sh"), num_hashes).alias("sig")
    )
    return sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_probe(
    probe_shingles: DataFrame,
    index_shingles: DataFrame | None = None,
    num_hashes: int = 128,
    bands: int = 32,
    index_bands: DataFrame | None = None,
) -> DataFrame:
    """Banded MinHash-LSH probe of a NEW batch against a corpus signature
    index: (new_id, corpus_id) candidate pairs — the incremental-ingest
    shape (daily batch vs existing crawl), vs the self-join backfill shape
    of :func:`minhash_lsh_candidates`.

    The corpus side is either ``index_shingles`` (a :func:`shingle_relation`,
    banded here and session-persisted) or a prebuilt ``index_bands``
    relation (:func:`minhash_bands` read back from its written table — the
    production path: the index is built once per corpus by an offline job).
    Per-ingest cost is the batch's signatures plus an equality join that
    touches only colliding buckets: O(batch collisions), independent of
    corpus size beyond the bucket lookups — the corpus is never re-shingled
    or re-hashed. No id-ordering constraint applies (the sides are distinct
    relations), and candidates carry no signature payload — the
    exact-Jaccard verify is the precision step."""
    persisted: list[DataFrame] = []
    if index_bands is None:
        assert index_shingles is not None, "need index_shingles or index_bands"
        index_bands = minhash_bands(index_shingles, num_hashes, bands).persist()
        persisted.append(index_bands)
    probe = minhash_bands(probe_shingles, num_hashes, bands)
    out = (
        probe.alias("n")
        .join(
            index_bands.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_hash") == F.col("c.band_hash")),
        )
        .select(F.col("n.id").alias("new_id"), F.col("c.id").alias("corpus_id"))
        .dropDuplicates(["new_id", "corpus_id"])
    )
    return _with_persisted(out, *persisted)


def incremental_classify(
    batch: DataFrame,
    fp_index: DataFrame,
    band_index: DataFrame,
    corpus_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Classify a NEW batch of documents against a prebuilt corpus index:
    (id, status ∈ exact_dup|near_dup|novel, match_id, jaccard).

    Index relations (built offline, once per corpus — typically written
    tables): ``fp_index`` = (fp, e_match) min corpus id per normalized-text
    fingerprint; ``band_index`` = :func:`minhash_bands` of the corpus
    shingle relation; ``corpus_shingles`` = the :func:`shingle_relation`
    itself (for the exact-Jaccard verify). Per-batch cost is the batch's
    own fingerprints + signatures plus bucket-collision joins — the corpus
    is never re-shingled. Used by both the declared ``dedup_incremental``
    query and the streaming ingest wrapper
    (:mod:`connected_data_lake_spark.streaming.dedup`)."""
    from connected_data_lake_spark.functions import text as _TX

    exact = (
        batch.select(F.col(id_col), _TX.fingerprint(text_col).alias("fp"))
        .join(fp_index, "fp")
        .select(id_col, "e_match")
    )
    # Probe the WHOLE batch, not batch-minus-exact: the final CASE prefers
    # exact_dup and coalesce picks e_match first, so probing exact dups too
    # yields identical output — while the former anti-join consumed the
    # ``exact`` lineage (batch scan + fingerprint md5 + index join) a
    # second time just to shrink the probe by the few exact dups
    # (same-session A/B at sf0.1: 1.235 → 1.126 s, identical rows).
    sh_n = shingle_relation(batch, text_col, id_col, shingle_n)
    cand = minhash_lsh_probe(sh_n, index_bands=band_index, num_hashes=num_hashes, bands=bands)
    ver = (
        cand.join(sh_n.withColumnsRenamed({"id": "new_id", "sh": "sh_new"}), "new_id")
        .join(
            corpus_shingles.withColumnsRenamed({"id": "corpus_id", "sh": "sh_corp"}),
            "corpus_id",
        )
        .withColumn(
            "jac",
            F.size(F.array_intersect("sh_new", "sh_corp")).cast("double")
            / F.size(F.array_union("sh_new", "sh_corp")),
        )
        .filter(F.col("jac") >= threshold)
    )
    w = Window.partitionBy("new_id").orderBy(F.desc("jac"), F.asc("corpus_id"))
    best = (
        ver.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("new_id").alias(id_col), F.col("corpus_id").alias("n_match"), "jac")
    )
    out = (
        batch.select(id_col)
        .join(exact, id_col, "left")
        .join(best, id_col, "left")
        .select(
            id_col,
            F.when(F.col("e_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("n_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            F.coalesce("e_match", "n_match").alias("match_id"),
            F.when(F.col("e_match").isNotNull(), F.lit(1.0))
            .otherwise(F.round("jac", 6))
            .alias("jaccard"),
        )
    )
    return _with_persisted(out, *getattr(cand, "_cdl_persisted", ()), sh_n)


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step after
    LSH): joins shingle sets back by id — two broadcast-able hash joins —
    and filters by threshold. Pass the candidate generator's ``shingles``
    relation to reuse its shingling pass."""
    if shingles is None:
        shingles = shingle_relation(df, text_col, id_col, shingle_n)
    sh = shingles.select(F.col("id").alias("_id"), F.col("sh").alias("_sh"))
    out = (
        candidates.join(sh.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return _with_persisted(
        out.select("id_a", "id_b", "jaccard"),
        *getattr(candidates, "_cdl_persisted", ()),
        shingles,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    block_cols: tuple[str, ...] = (),
    threshold: float = 0.5,
    max_df: int | None = None,
    copartition_pairs: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted shingle index.

    Explodes each doc's distinct shingle set into postings, equality-joins
    postings on (shingle [, block_cols]), and counts common shingles per
    candidate pair; Jaccard then falls out of set sizes alone:
    |A∩B| / (|A| + |B| - |A∩B|). For any ``threshold > 0`` this is exactly
    the pairwise array-intersect semantics — a pair with zero common
    shingles can't clear the threshold — but the work is
    Σ_shingle df(shingle)² instead of the blocked O(n²) all-pairs join
    (measured 400x at sf0.1). Shuffle keys: the shingle (index build) and
    the (id_a, id_b) pair (count agg); both partition-parallel. Pairs
    sharing only ultra-common shingles cost the most — at extreme scale add
    a prefix filter (index only each doc's (1-t)·|sh|+1 rarest shingles);
    df-skew here is mild (max df 14 at sf0.1) so the plain index wins.

    ``copartition_pairs`` (default True) re-establishes a PLANNER-VISIBLE
    hash(id) partitioning on the probe side of the self-join: all join
    rows of a pair (a, b) then live in a's partition, so the (id_a, id_b)
    count aggregate needs NO exchange (hash(a.id) satisfies the group's
    clustered distribution) — the Σ_shingle df² pair relation never
    crosses the network. The persisted postings relation IS already
    hash(id)-partitioned (``spread``), but its cached plan is an
    AdaptiveSparkPlan whose partitioning Catalyst cannot see, so without
    the explicit narrow re-shuffle (postings-sized — keys + metadata
    only, the §8 lightweight-proxy trade) ENSURE_REQUIREMENTS inserts a
    full pair exchange (measured at sf0.1: 2.53M directed join rows,
    1.13M distinct pairs, vs a 260k-row postings shuffle). The win
    requires the build side to hash-join (broadcast/shuffled-hash
    preserve the probe's partitioning); under a sort-merge plan the
    pair exchange returns and the id shuffle is one extra narrow pass —
    callers in that regime pass ``copartition_pairs=False``.

    ``max_df`` is the concrete scale lever: postings whose shingle appears
    in more than ``max_df`` docs are dropped from the index (the classic
    df-cap / stop-shingle cut). Default ``None`` = exact — right for this
    corpus's mild skew. At web-corpus scale set it near the 99.9th df
    percentile: a boilerplate shingle shared by 1e6 docs contributes 1e12
    join rows but almost no Jaccard evidence, and a capped intersection
    only ever UNDERcounts, so threshold precision is preserved (recall for
    pairs glued solely by boilerplate is the explicit trade; the prefix
    filter above is the recall-preserving upgrade).
    """
    assert threshold > 0, "inverted-index path requires a positive threshold"
    # token-count pre-filter, not size(sh) > 0: a filter on the computed
    # shingle column is pushed below the projection and re-runs the whole
    # tokenize+hash fold for the size check (see shingle_relation).
    # The PERSIST sits at the DOC level, below the explode (r15):
    # InferFiltersFromGenerate re-derives a size(sh) > 0 filter under any
    # explode of a computed array and pushes it through the projection —
    # re-inlining the whole fold into the scan filter no matter what the
    # caller filtered on. With the doc-level relation cached, that inferred
    # filter lands on the materialized column instead; the explode itself
    # is a cheap cache read per consumer.
    # (r14 note: a basket-form rewrite — collect_list posting lists + i<j
    # explode, the join_cooccurrence trick — was A/B-measured SLOWER here,
    # 1.98 -> 2.64 s at sf0.1: the inverted index is dominated by
    # SINGLETON buckets, so the ObjectHashAggregate list-building overhead
    # is paid per posting while the self-join only pays at matching keys.)
    sh_rel = spread(df, id_col).filter(TX.has_tokens(text_col, shingle_n)).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(TX.shingle_hashes(text_col, shingle_n)).alias("sh"),
    ).persist()
    base = sh_rel.select(
        "id", *block_cols, F.size("sh").alias("sz"), F.explode("sh").alias("tok")
    )
    postings = base
    if max_df is not None:
        hot = (
            base.groupBy("tok", *block_cols)
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("tok", *block_cols)
        )
        # stop-shingle set is tiny by construction (the df distribution's
        # extreme tail) — broadcast anti-join, no extra shuffle of postings
        postings = base.join(F.broadcast(hot), ["tok", *block_cols], "left_anti")
    probe = postings.repartition(F.col("id")) if copartition_pairs else postings
    a, b = probe.alias("a"), postings.alias("b")
    cond = (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("sz_a"),
            F.first("b.sz").alias("sz_b"),
        )
    )
    out = (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _with_persisted(out, sh_rel)


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
    copartition_pairs: bool = True,
) -> DataFrame:
    """DIRECTED n-gram containment pairs: C(src→dst) = |src ∩ dst| / |src|.

    Jaccard misses sub-document duplication — a short doc fully quoted
    inside a long one scores |A|/|B| ≈ 0 on Jaccard but 1.0 on containment
    of the short side, which is why curation pipelines check containment
    for quote/boilerplate/excerpt dedup alongside symmetric near-dup.
    Same inverted-shingle-index plan as :func:`ngram_jaccard_pairs`
    (Σ_shingle df² candidate work, shuffle on the shingle then on the
    directed pair) with both directions of every candidate emitted; only
    the denominator differs.

    ``max_df`` is the same concrete scale lever as in
    :func:`ngram_jaccard_pairs` (VERDICT r8 "What's wrong" #2): postings
    whose shingle appears in more than ``max_df`` docs are dropped via a
    broadcast anti-join against the (tiny by construction) stop-shingle
    tail, so one boilerplate shingle shared by 1e6 docs cannot turn the
    postings self-join into ~1e12 rows. A capped intersection only
    UNDERcounts, so containment >= threshold precision is preserved;
    recall for pairs glued solely by boilerplate shingles is the explicit
    trade. Default ``None`` = exact (this corpus's df skew is mild).

    ``copartition_pairs``: same probe-side hash(src) co-partitioning as
    :func:`ngram_jaccard_pairs` — every directed pair (src, dst) lives in
    src's partition, so the (src_id, dst_id) count aggregate runs with no
    exchange; see the trade note there."""
    assert threshold > 0, "inverted-index path requires a positive threshold"
    # token-count pre-filter, not size(sh) > 0 (see shingle_relation);
    # doc-level persist below the explode so InferFiltersFromGenerate's
    # re-derived size filter lands on the cached column, not a re-inlined
    # fold in the scan filter (see ngram_jaccard_pairs)
    sh_rel = spread(df, id_col).filter(TX.has_tokens(text_col, shingle_n)).select(
        F.col(id_col).alias("id"),
        F.array_distinct(TX.shingle_hashes(text_col, shingle_n)).alias("sh"),
    ).persist()
    base = sh_rel.select(
        "id", F.size("sh").alias("sz"), F.explode("sh").alias("tok")
    )
    postings = base
    if max_df is not None:
        hot = (
            base.groupBy("tok")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("tok")
        )
        postings = base.join(F.broadcast(hot), ["tok"], "left_anti")
    probe = postings.repartition(F.col("id")) if copartition_pairs else postings
    a, b = probe.alias("a"), postings.alias("b")
    # Aggregate UNDIRECTED (a.id < b.id) and emit both directions from the
    # aggregated pair afterwards: |src∩dst| is symmetric and both set sizes
    # ride the same aggregate row, so counting each unordered pair once
    # halves the join output AND the pair-aggregate state vs the former
    # a.id != b.id join; both directions then cost one post-agg explode of
    # a 2-element array (ONE subtree — a unionAll of two selects would
    # duplicate the whole aggregate lineage).
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("sz_a"),
            F.first("b.sz").alias("sz_b"),
        )
    )
    both = inter.select(
        "inter",
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    F.col("sz_a").alias("sz_src"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    F.col("sz_b").alias("sz_src"),
                ),
            )
        ).alias("_d"),
    )
    out = (
        both.select(
            F.col("_d.src_id").alias("src_id"),
            F.col("_d.dst_id").alias("dst_id"),
            F.round(F.col("inter").cast("double") / F.col("_d.sz_src"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
    )
    return _with_persisted(out, sh_rel)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text_col: str, shingle_n: int = 3) -> Column:
    """64-bit SimHash (bigint): per-feature xxhash64, ±1 vote per bit,
    sign of the vote sum sets the bit. Features are distinct token
    n-gram shingles (set semantics — aligns with the Jaccard ground
    truth; unigram-token features barely separate same-vocabulary
    docs). Pure HOF expression."""
    feats = F.array_distinct(TX.shingles(text_col, shingle_n))
    # hash each feature ONCE up front — an xxhash64(t) inside the per-bit
    # lambda is re-evaluated per bit (64 hashes/feature; measured 4x slower)
    hashes = F.transform(feats, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        # 2-arg transform lambda binds (element, index) = (vote acc, bit).
        # call_function: SQL shiftright takes a Column bit index (the
        # PySpark wrapper F.shiftright only accepts an int)
        lambda acc, h: F.transform(
            acc,
            lambda a, i: a
            + F.when(
                F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        ),
    )
    word = F.aggregate(
        F.transform(
            votes,
            lambda v, i: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    # NULL (not 0) for docs with < shingle_n tokens: an all-zero signature
    # would make every short doc collide with every other at hamming 0
    return F.when(F.size(feats) > 0, word)


def simhash_from_hashes(hashes_col: Column) -> Column:
    """64-bit SimHash from a precomputed per-feature hash array — the 64
    per-bit votes run as one numpy unpack + sum per Arrow batch instead of
    a 64-wide interpreted HOF per feature. Only int64 arrays cross to
    Python. NULL for empty feature sets."""

    @F.pandas_udf("long")
    def _sh(hashes: pd.Series) -> pd.Series:
        # Batched like minhash_from_hashes: one flattened unpackbits +
        # np.add.reduceat segment-sum per Arrow batch replaces the per-row
        # loop; bit votes / word packing are identical. Empty/None rows stay
        # NULL (see simhash(): a 0 signature makes all short docs mutual
        # "duplicates").
        vals = hashes.to_numpy()
        lens = np.fromiter(
            (0 if h is None else len(h) for h in vals), dtype=np.int64, count=len(vals)
        )
        out: list = [None] * len(vals)
        nz = np.nonzero(lens > 0)[0]
        if len(nz):
            flat = np.concatenate([np.asarray(vals[i], dtype=np.int64) for i in nz])
            # (total_feats, 64) bit matrix, little-endian bit order per word;
            # stays uint8 — reduceat accumulates into int64 directly, which
            # avoids materializing an 8x-wider int64 copy of the bit matrix
            bits = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).reshape(-1, 64)
            offsets = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            # per-doc 1-bit counts (int64 accumulator: uint8 would wrap at
            # 256 features)
            ones = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)
            votes = 2 * ones - lens[nz][:, None]  # ±1 vote per bit
            words = (
                np.packbits(votes > 0, axis=1, bitorder="little")
                .view(np.int64)
                .ravel()
            )
            for j, i in enumerate(nz):
                out[i] = int(words[j])
        return pd.Series(out)

    return _sh(hashes_col)


def simhash_vectorized(text_col: str, shingle_n: int = 3) -> Column:
    """Vectorized SimHash — same bit-vote semantics as :func:`simhash`
    (identical output for identical feature hashes); feature hashing stays
    JVM-side (shingle_hashes — no feature strings are built), bit votes via
    :func:`simhash_from_hashes`. Hash family differs from :func:`simhash`'s
    string xxhash64; pick one per index build."""
    feats = F.array_distinct(TX.shingle_hashes(text_col, shingle_n))
    return simhash_from_hashes(feats)


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    n_chunks: int = 8,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: band the 64-bit signature into
    ``n_chunks`` bit chunks (pigeonhole: any pair within Hamming ≤
    n_chunks-1 must agree on ≥1 chunk), equality-join per chunk, then
    exact Hamming filter. Chunk widths are as equal as possible
    (``64 % n_chunks`` chunks get one extra bit), so n_chunks need not
    divide 64. Wider chunks = exponentially fewer bucket collisions:
    at cluster scale prefer few wide chunks (4×16 → Hamming ≤ 3
    guaranteed) — recall beyond the pigeonhole bound costs bucket load.
    """
    assert 1 <= n_chunks <= 64
    base_w, extra = divmod(64, n_chunks)
    widths = [base_w + 1] * extra + [base_w] * (n_chunks - extra)
    offsets = [sum(widths[:j]) for j in range(n_chunks)]
    # persist: both sides of the self-join and the exact-Hamming projection
    # reference the signature; without this the UDF runs once per reference
    # (same index-build-once rationale as minhash_lsh_candidates)
    if shingles is None:
        shingles = shingle_relation(df, text_col, id_col, shingle_n)
    # no isNotNull filter on the UDF output — see minhash_lsh_candidates
    # (shingle_relation guarantees non-empty sets; the filter doubled the
    # signature UDF as a second ArrowEvalPython node)
    sig = shingles.select(
        "id",
        simhash_from_hashes(F.col("sh")).alias("sh"),
    ).persist()
    chunked = sig.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh", off).bitwiseAND(F.lit((1 << w) - 1))
                    for off, w in zip(offsets, widths)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id"))
            # exact-Hamming test INSIDE the join condition: evaluated at
            # hash-join probe time (whole-stage codegen), so the narrow
            # chunk buckets' false collisions die before the dropDuplicates
            # shuffle — with 4-bit chunks that shuffle was ~16x the corpus
            # (measured 20s -> 2s at sf0.1)
            & (
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))) <= max_hamming
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return _with_persisted(out, sig, shingles)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_duplicates(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_bands: int = 12,
    planes_per_band: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-duplicate pairs via BANDED random-hyperplane LSH:
    ``n_bands`` independent sign signatures of ``planes_per_band`` planes
    each; a pair is a candidate if ANY band's signature matches exactly;
    exact cosine verifies candidates against ``threshold``.

    Banding is what makes hyperplane LSH usable for near-dup recall: a
    single 16-plane signature misses a θ-angle pair with prob
    1-(1-θ/π)^16 (≈ 20% even at cos 0.999), while n_bands independent
    bands miss with prob (1-(1-θ/π)^ppb)^n_bands (≈ 2e-9 at the defaults
    for θ ≈ 0.04 rad). Band width controls the candidate rate: random
    isotropic pairs collide on a 16-plane band at ~2^-16, so the exact
    cosine verify touches ~n²·n_bands/65536 pairs instead of the ~n²/32
    an 8-plane band admits (measured 5.3s → <1s at 5k vectors). Cost
    stays O(collisions) — the same banded shape as MinHash-LSH above.

    The n_bands·planes_per_band plane dots are computed by the packed
    hyperplane sketch (one BLAS matmul per Arrow batch — the measured-fast
    path; an inlined per-plane HOF expression tree was ~15x slower to plan
    + run); band b is bits [b·ppb, (b+1)·ppb) of the packed words, so the
    banding semantics are identical to slicing the plane list."""
    from connected_data_lake_spark.operators.similarity import hyperplane_sketch, make_planes

    n_bits = n_bands * planes_per_band
    n_words = (n_bits + 63) // 64
    planes = make_planes(dim=_dim_of(df, emb_col), n_planes=n_words * 64, seed=seed)
    # persist: both sides of the self-join reference the sketch — without
    # this the pandas-UDF matmul runs twice (index-build-once pattern)
    sketch = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        hyperplane_sketch(emb_col, planes).alias("_sk"),
    ).persist()
    mask = (1 << planes_per_band) - 1
    # band b = planes_per_band-bit slice of the packed sketch words
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.call_function(
            "shiftright",
            F.get("_sk", F.floor(b * planes_per_band / F.lit(64)).cast("int")),
            (b * planes_per_band) % 64,
        ).bitwiseAND(F.lit(mask)),
    )
    sig = sketch.select(
        "id",
        "emb",
        F.posexplode(bands).alias("band", "bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.emb").alias("emb_a"),
            F.col("b.emb").alias("emb_b"),
        )
        # dedup multi-band collisions BEFORE the 64-dim cosine so the exact
        # verify runs once per candidate pair, not once per colliding band
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.round(VX.cosine("emb_a", "emb_b"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return _with_persisted(out, sketch)


def _dim_of(df: DataFrame, emb_col: str) -> int:
    row = df.select(F.size(emb_col).alias("d")).first()
    return int(row["d"]) if row else 0
