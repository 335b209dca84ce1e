"""Link-graph analytics for frontier prioritization — PageRank over the
host graph (r7). Real crawl schedulers order discovery by link authority
(OPIC/PageRank priors); this is that operator over the edge sets
`extract_hrefs`/crawl rounds produce, aggregated to hosts.

Reference parity note: the reference is per-record metadata extraction
(warc_metadata_sidecar.py:205) with no graph stage; this extends the
frontier family (SURVEY §2 N-ops) the way the scheduler extends
politeness.

Scale shape (100 TB / 10^9 hosts):
  * edges aggregate once to (src, dst, weight) + per-src out-weight —
    both map-side-combinable groupBys on the src key; iterations then
    JOIN rank->edges on src (rank and out-weight share the src
    partitioning, so AQE reuses one exchange) and aggregate
    contributions on dst — the classic two-exchange-per-iteration
    PageRank; the rank frame is node-cardinality and checkpointed per
    iteration to keep lineage flat (persist(DISK) on a real cluster);
  * `exact=True` (default, oracle mode) folds each dst's contributions
    in SORTED order (the r5 bit-stable-Lloyd rule) so ranks are
    bit-identical across runs/partitionings and against the sequential
    twin — the collect_list is bounded by the dst's distinct-src
    in-degree, fine for host graphs (fan-in of distinct hosts), while
    `exact=False` uses plain sum() for web-scale node counts where
    bit-stability is traded for O(1) aggregation state;
  * dangling mass (hosts with no out-links) redistributes uniformly —
    its per-iteration total is ONE scalar collected from a sorted fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sorted_sum(col: str) -> F.Column:
    return F.aggregate(
        F.array_sort(F.collect_list(col)), F.lit(0.0), lambda acc, v: acc + v
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    exact: bool = True,
) -> DataFrame:
    """Weighted PageRank: returns (node, rank). rank_{t+1}(v) =
    (1-d)/N + d*dangling/N + sum_u rank_t(u) * d * w(u,v)/outw(u).

    Deterministic in exact mode: per-dst contributions fold in sorted
    order; each contribution is computed as ((rank * d) * w) / outw in
    exactly that operation order — the sequential twin
    (driver_queries._pagerank_twin) replays it bit-for-bit."""
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # no checkpoint on the initial ranks: it is a constant-column projection
    # of the already-checkpointed nodes frame, so iteration 1's two
    # references just re-project the materialized blocks (r8; one fewer
    # sequential job)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _it in range(iters):
        linked = ranks.join(outw, ranks["node"] == outw["src"], "left")
        # dangling mass stays IN the plan as a one-row cross-joined
        # aggregate instead of a per-iteration driver collect — one Spark
        # job per iteration (the checkpoint) instead of two. The base-term
        # arithmetic replicates the twin's Python float expression
        # (1-d)/n + (d*dang)/n in the same IEEE operation order, so ranks
        # remain bit-identical to the sequential oracle.
        dang_df = linked.filter(F.col("outw").isNull()).agg(
            _sorted_sum("rank").alias("_dang")
        )
        base_col = F.lit((1.0 - damping) / n) + (
            F.lit(damping) * F.coalesce(F.col("_dang"), F.lit(0.0))
        ) / F.lit(float(n))
        contrib = (
            linked.filter(F.col("outw").isNotNull())
            .join(e, "src")
            .select(
                "dst",
                (((F.col("rank") * F.lit(damping)) * F.col("w")) / F.col("outw")).alias("c"),
            )
        )
        agg_c = _sorted_sum("c") if exact else F.sum("c")
        inc = contrib.groupBy("dst").agg(agg_c.alias("inc"))
        ranks = (
            nodes.join(inc, nodes["node"] == inc["dst"], "left")
            .crossJoin(dang_df)
            .select(
                "node",
                (base_col + F.coalesce(F.col("inc"), F.lit(0.0))).alias("rank"),
            )
        )
        # host graphs are orders of magnitude smaller than the corpus; when
        # the node count (already known exactly) is small, checkpoint one
        # partition instead of shuffle-partition-many near-empty ones —
        # partitioning only, rows unchanged. Large graphs keep full width.
        #
        # Checkpoint CADENCE (r8): each eager checkpoint is a serialized
        # driver-blocking job, and on a small graph the un-checkpointed
        # iteration subtree re-executes in ~2-3 parallel copies at trivial
        # cost — so small graphs materialize every SECOND iteration (and
        # always the last); the plan stays depth-2, never exponential.
        # Large graphs keep the per-iteration checkpoint: there the 2-3x
        # re-execution is corpus-scale work. Placement of a checkpoint
        # changes materialization only, never values (sorted folds
        # throughout).
        if n <= 100_000:
            ranks = ranks.coalesce(1)
            if _it % 2 == 1 or _it == iters - 1:
                ranks = ranks.localCheckpoint(eager=True)
        else:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    exact: bool = True,
) -> DataFrame:
    """HITS hubs & authorities over the host graph: returns
    (node, hub, authority). Per round (Kleinberg's update, L1-normalized
    so the twin needs no sqrt):

        raw_a(v) = sum_{u->v} hub(u) * w(u,v);   a = raw_a / sum(raw_a)
        raw_h(u) = sum_{u->v} a(v)   * w(u,v);   h = raw_h / sum(raw_h)

    Crawl schedulers use the authority side as a discovery prior the
    same way pagerank() is used above; hubs rank link-farm-ish pages for
    trap demotion. The reference has no graph stage (its loop is
    per-record, warc_metadata_sidecar.py:205) — this extends SURVEY §2's
    N-ops frontier family.

    Determinism contract (exact=True): per-node contributions fold in
    ascending sorted order, each contribution computed as hub*w (ONE
    multiply), the L1 norm folds the per-node raw scores sorted
    ascending, and each normalized score is raw/norm (ONE divide) — the
    sequential twin (driver_queries._hits_twin) replays bit-for-bit.

    Scale shape (10^9-host graphs): same two-exchange-per-half-round as
    pagerank — scores join edges on the score key, contributions
    aggregate on the other endpoint (both map-side-combinable in
    exact=False mode); the L1 norm is ONE collected scalar per
    half-round (a sorted fold over node-cardinality raw scores); score
    frames are node-cardinality and localCheckpoint-ed per round to keep
    lineage flat (persist(DISK) on a real cluster)."""
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    agg_fold = _sorted_sum if exact else (lambda c: F.sum(c))
    hubs = nodes.withColumn("h", F.lit(1.0 / n)).localCheckpoint(eager=True)
    auth = nodes.withColumn("a", F.lit(1.0 / n)).localCheckpoint(eager=True)

    def _half(scores: DataFrame, score_col: str, join_end: str, out_end: str,
              out_col: str) -> DataFrame:
        contrib = (
            e.join(scores, e[join_end] == scores["node"])
            .select(
                F.col(out_end).alias("endp"),
                (F.col(score_col) * F.col("w")).alias("c"),
            )
        )
        raw = contrib.groupBy("endp").agg(agg_fold("c").alias("raw"))
        norm = raw.agg(_sorted_sum("raw").alias("s")).collect()[0]["s"]
        if not norm:  # edgeless graph: scores stay at their prior
            return scores.select("node", F.col(score_col).alias(out_col))
        return (
            nodes.join(raw, nodes["node"] == raw["endp"], "left")
            .select(
                "node",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.lit(norm)).alias(out_col),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(iters):
        auth = _half(hubs, "h", "src", "dst", "a")
        hubs = _half(auth, "a", "dst", "src", "h")
    return (
        hubs.join(auth.withColumnRenamed("node", "anode"),
                  hubs["node"] == F.col("anode"))
        .select("node", "h", F.col("a").alias("authority"))
        .withColumnRenamed("h", "hub")
    )


def mirror_groups(
    captures: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    min_shared: int = 3,
    max_hosts_per_digest: int = 50,
) -> DataFrame:
    """Mirror-site detection: (host, group_id, group_size) for every
    host that belongs to a mirror group — hosts serving >= `min_shared`
    identical payload digests close into connected components (the
    large-star/small-star rounds of operators/dedup.dup_clusters on
    string hosts). Crawlers demote mirrors the way they demote traps:
    fetching the same corpus from three hostnames is budget burned.
    Builds directly on the reference's payload-digest column (its D1
    memo, warc_metadata_sidecar.py:170-186) — the host-level rollup of
    the same signal.

    Scale shape (10^9 captures):
      * (host, digest) dedups with ONE map-side-combinable distinct;
      * digests on > `max_hosts_per_digest` hosts drop BEFORE the
        per-digest self-join (boilerplate/empty-page digests are the
        quadratic mass — the max_bucket discipline from LSH pairing);
        the self-join is then bounded by cap^2 per digest;
      * pair support aggregates map-side on (host_a, host_b);
      * components run on the (few) qualifying host pairs, not
        captures. Hosts in no pair are absent (not mirrors)."""
    per = (
        captures.select(
            F.lower(F.col(host_col)).alias("host"),
            F.col(digest_col).alias("digest"),
        )
        .where(F.col("host").isNotNull() & F.col("digest").isNotNull())
        .distinct()
    )
    deg = per.groupBy("digest").agg(F.count(F.lit(1)).alias("n_hosts"))
    kept = per.join(
        deg.filter(
            (F.col("n_hosts") >= 2) & (F.col("n_hosts") <= max_hosts_per_digest)
        ).select("digest"),
        "digest",
        "left_semi",
    )
    b = kept.select(
        F.col("digest").alias("digest2"), F.col("host").alias("host_b")
    )
    pairs = (
        kept.join(b, (kept["digest"] == b["digest2"]) & (kept["host"] < b["host_b"]))
        .groupBy(F.col("host").alias("host_a"), "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    from warc_metadata_sidecar_spark.operators.dedup import dup_clusters

    comps = dup_clusters(pairs.select("host_a", "host_b"), cast=None)
    return comps.select(
        F.col(comps.columns[0]).alias("host"),
        F.col("cluster_id").alias("group_id"),
        F.col("cluster_size").cast("long").alias("group_size"),
    )
