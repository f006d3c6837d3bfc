"""Connected components via alternating large-star / small-star.

Distributed replacement for the reference's in-memory union-find
(``/root/reference/preprocess_data.py:116-142``). Same output contract:
every vertex labeled with its component's MIN member id (≙ the
reference's root-as-cluster-id convention — labels are compared as
partitions, not raw values).

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond"): converges in O(log n) rounds; each round is two
join+aggregate passes over the edge DataFrame — no collect_list, so a
10^9-leaf star never materializes an adjacency list in one task.
Lineage is truncated every round via reliable checkpoint (iterative
plans otherwise grow unboundedly — SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor to min(Γ(u) ∪ {u})."""
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least(F.col("mn"), F.col("src")).alias("m"))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low; connect all smaller neighbors (and u) to the min."""
    o = (
        e.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    mins = o.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        o.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("src"), F.col("m").alias("dst")))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _edge_summary(e: DataFrame) -> tuple[int, int]:
    # bit_xor: overflow-free (ANSI mode) and order-independent checksum of the
    # distinct edge set; equal (count, checksum) across rounds => converged.
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("chk"),
    ).collect()[0]
    return int(row["n"]), int(row["chk"])


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    on_iteration=None,
    reliable: bool = False,
) -> DataFrame:
    """edges(src,dst) [+ vertices(id)] -> labels(id, cluster_id=min member).

    Vertices absent from any edge become singleton clusters (their own id)
    when ``vertices`` is supplied.

    Lineage is truncated every round. Default is ``localCheckpoint`` (memory,
    no disk round-trip — the rounds are the latency-critical serial section);
    pass ``reliable=True`` for HDFS-style checkpoints when executor loss must
    not restart the loop. Job-level resume is handled one level up by the
    pipeline's edge/label stage checkpoints either way.
    """
    sc = edges.sparkSession.sparkContext
    if reliable and sc._jsc.sc().getCheckpointDir().isEmpty():
        import os
        import tempfile

        sc.setCheckpointDir(os.path.join(tempfile.gettempdir(), "dupdetect-ckpt"))

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)

    e = _ckpt(
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev = _edge_summary(e)
    for it in range(max_iter):
        e_next = _ckpt(_small_star(_large_star(e)))
        cur = _edge_summary(e_next)
        if on_iteration is not None:
            on_iteration(it, cur[0])
        e.unpersist()
        e = e_next
        if cur == prev:
            break
        prev = cur

    labels = (
        e.select(F.col("src").alias("id"), F.col("dst").alias("cluster_id"))
        .unionByName(e.select(F.col("dst").alias("id"), F.col("dst").alias("cluster_id")))
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    if vertices is not None:
        v = vertices.select(F.col(vertices.columns[0]).cast("long").alias("id"))
        labels = (
            v.join(labels, "id", "left")
            .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
        )
    return labels


def union_find_oracle(edges: list[tuple[int, int]], vertices: list[int] | None = None) -> dict[int, int]:
    """In-process union-find oracle for tests (same semantics as the
    reference's union-find at /root/reference/preprocess_data.py:116-142,
    reduced to min-member labels)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for s, d in edges:
        union(int(s), int(d))
    for v in vertices or []:
        find(int(v))
    return {x: find(x) for x in parent}
