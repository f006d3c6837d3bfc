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

from pyspark.sql import DataFrame, Observation
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


def _summary_metrics():
    # bit_xor: overflow-free (ANSI mode) and order-independent checksum of the
    # distinct edge set; equal (count, checksum) across rounds => converged.
    return (
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("chk"),
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    on_iteration=None,
    reliable: bool = False,
    pre_deduped: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges(src,dst) [+ vertices(id)] -> labels(id, cluster_id=min member).

    Vertices absent from any edge become singleton clusters (their own id)
    when ``vertices`` is supplied. ``pre_deduped=True`` skips the initial
    distinct() when the caller already dedup'd the edge set (saves a full
    shuffle — callers like the pipeline otherwise pay it twice).

    Lineage is truncated every round. Default is ``localCheckpoint`` (memory,
    no disk round-trip — the rounds are the latency-critical serial section);
    pass ``reliable=True`` for HDFS-style checkpoints when executor loss must
    not restart the loop. Job-level resume is handled one level up by the
    pipeline's edge/label stage checkpoints either way.

    The convergence summary (count + order-independent checksum) rides the
    SAME job as each round's checkpoint via ``observe`` — no separate
    aggregate job per round (the per-round fixed costs are what keep CC
    from scaling at small corpus sizes).
    """
    sc = edges.sparkSession.sparkContext
    prev_ckpt_dir = None
    if reliable:
        if checkpoint_dir is not None:
            # the checkpoint dir is SESSION-GLOBAL state: remember the
            # caller's setting and restore it after the loop, so one
            # pipeline's workdir never leaks into later reliable callers
            # (or a concurrent pipeline sharing the session)
            opt = sc._jsc.sc().getCheckpointDir()
            prev_ckpt_dir = None if opt.isEmpty() else opt.get()
            sc.setCheckpointDir(checkpoint_dir)
        elif sc._jsc.sc().getCheckpointDir().isEmpty():
            import os
            import tempfile

            sc.setCheckpointDir(os.path.join(tempfile.gettempdir(), "dupdetect-ckpt"))

    def _ckpt_with_summary(df: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
        obs = Observation()
        df = df.observe(obs, *_summary_metrics())
        out = df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)
        got = obs.get
        return out, (int(got["n"] or 0), int(got["chk"] or 0))

    init = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).where(
        F.col("src") != F.col("dst")
    )
    if not pre_deduped:
        init = init.distinct()
    # ALWAYS checkpoint the init set (even off a caller-persisted DF): the
    # round plans self-union the edges, and Spark's relation-dedup rewrites
    # expression ids in the union branches, which can MISS the outer cache
    # and silently recompute the whole upstream detect pipeline per round
    # (measured: 43s vs 2.6s for round 0 at 400k docs).
    e, prev = _ckpt_with_summary(init)
    # Size the loop's shuffle width to the ACTUAL edge count (known from
    # the init summary): the localCheckpoint materialization bypasses
    # AQE's partition coalescing, so a small edge set otherwise schedules
    # the session default (2x cores) of near-empty tasks per exchange,
    # 4-6 exchanges per round — pure fixed latency in the serial section.
    # Only ever LOWERS toward 8 for small inputs; at production edge
    # volumes the session setting stands untouched. Restored after the
    # loop (session conf is shared state).
    sess = edges.sparkSession
    prev_sp = sess.conf.get("spark.sql.shuffle.partitions", None)
    try:
        default_sp = int(prev_sp) if prev_sp else 200
    except ValueError:
        default_sp = 200
    loop_sp = min(default_sp, max(8, (prev[0] // 2_000_000) + 1))
    converged = False
    try:
        if loop_sp < default_sp:
            sess.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
        for it in range(max_iter):
            e_next, cur = _ckpt_with_summary(_small_star(_large_star(e)))
            if on_iteration is not None:
                on_iteration(it, cur[0])
            e.unpersist()
            e = e_next
            if cur == prev:
                converged = True
                break
            prev = cur
    finally:
        if prev_sp is not None:
            sess.conf.set("spark.sql.shuffle.partitions", prev_sp)
        else:
            sess.conf.unset("spark.sql.shuffle.partitions")

    if reliable and checkpoint_dir is not None:
        # restore the caller's global setting; if there was none, point at
        # the stable tempdir fallback — leaving the global dir aimed into
        # this caller's (possibly soon-deleted) workdir would misdirect the
        # next reliable caller that doesn't pass its own dir
        import os
        import tempfile

        sc.setCheckpointDir(
            prev_ckpt_dir or os.path.join(tempfile.gettempdir(), "dupdetect-ckpt")
        )
    if not converged:
        # Labels derived from a still-evolving edge set would split true
        # components ACROSS cluster ids with no downstream signal — fail
        # loudly instead. The alternating algorithm converges in O(log^2 n)
        # rounds, so 50 covers any physical corpus; hitting this means a
        # checksum-collision oscillation or a genuinely pathological graph.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; labels from an unconverged edge set would silently split "
            "components. Raise max_iter (the alternating algorithm needs "
            "O(log^2 n) rounds) or inspect the edge graph."
        )
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
