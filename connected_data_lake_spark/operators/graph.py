"""Distributed connected components over candidate-duplicate pair edges.

Dedup pipelines emit PAIRS (MinHash/SimHash/embedding LSH verify steps),
but retention decisions need CLUSTERS: transitively-linked documents must
be grouped so exactly one survivor per component is kept — pairwise
survivor picks can drop both ends of A-B while keeping both of B-C.

The operator is iterative min-label propagation over the symmetrized edge
list (the MapReduce-CC family — Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): every node repeatedly adopts the smallest
label among itself and its neighbors until a fixpoint. Each round is one
shuffle (edges ⋈ labels on the node key) plus a min-aggregate with map-side
partial combine; convergence is detected with a single-scalar action (the
label-sum strictly decreases until the fixpoint — no row-level diff join).

Scale notes (100 TB corpus, ~10⁹ candidate pairs):
- Rounds = graph diameter. Near-duplicate components are overwhelmingly
  tiny and star-shaped (copies of one source document), so 3-5 rounds
  suffice; ``max_iter`` guards the adversarial long-chain case, where the
  large-star/small-star variant (same paper) bounds rounds at O(log n) —
  the switch is local to ``_propagate`` if such graphs ever appear.
- Per-round state is (node, label) — two longs — regardless of corpus
  width; the document payload never enters the loop.
- The edge relation is persisted once and re-read every round; each
  round's label relation is ``localCheckpoint``-ed to TRUNCATE LINEAGE —
  without it the logical plan nests one join+union per round and grows
  exponentially (a 10-round chain OOM'd the driver just stringifying the
  tree). On a multi-node cluster swap ``localCheckpoint`` (fast, but lost
  with an executor) for a reliable ``checkpoint`` dir — one-line change.

The reference has no graph surface; this extends its dedup family the same
way the LSH operators do (build mandate — SURVEY §7.1 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _edge_list(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrize (src, dst) pairs into a directed neighbor relation."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` is the smallest node id reachable through the pair graph,
    so ids are deterministic and engine-independent.

    Raises ``RuntimeError`` if the fixpoint is not reached in ``max_iter``
    rounds (diameter-bound exceeded — see module scale notes).

    Diagnostics: the returned DataFrame carries ``_cdl_cc_rounds`` (rounds
    actually used — an operations dashboard should alert when this creeps
    toward the cap long before a run ever dies on it), and a
    ``RuntimeWarning`` fires once rounds exceed 80% of ``max_iter``.
    """
    import warnings
    edges = _edge_list(pairs, src, dst).persist()
    # seed labels with the FIRST propagation folded in — min(self, direct
    # neighbors) — which saves one full round on every graph; lazy
    # localCheckpoint truncates lineage (module notes) and materializes
    # under the convergence-scalar action, so each round costs ONE job.
    labels = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.min("v"), F.first("u")).alias("component"))
        .localCheckpoint(eager=False)
    )
    # label-sum as the convergence scalar: min-label updates only ever
    # decrease it, and equality <=> fixpoint. decimal(38,0) cannot overflow
    # for int64 node ids at any realistic node count.
    checksum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for round_no in range(1, max_iter + 1):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("component"))
        )
        new_labels = (
            labels.unionAll(neighbor_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        new_checksum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        # the collect above materialized new_labels' own checkpoint blocks;
        # the PREVIOUS round's blocks are no longer read by anything — free
        # them now instead of waiting for the context cleaner's GC cycle
        # (accumulated per-round blocks made suite runs progressively
        # slower). Never unpersist the CURRENT labels: localCheckpoint
        # truncates lineage, so its blocks ARE the data.
        labels.unpersist()
        labels = new_labels
        if new_checksum == checksum:
            edges.unpersist()
            if round_no > 0.8 * max_iter:
                warnings.warn(
                    f"connected_components converged in {round_no} of "
                    f"{max_iter} rounds — the pair graph's diameter is "
                    "approaching the bail-out cap; consider the "
                    "large-star/small-star propagation (module notes)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            labels._cdl_cc_rounds = round_no
            return labels
        checksum = new_checksum
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the pair graph has a longer chain than duplicate clusters produce "
        "- switch the propagation step to large-star/small-star (module notes)"
    )
