"""Graph analytics over relationship structure hidden in the fact tables:
degree distributions, thresholded triangle counting, and PageRank on an
aggregated trade graph.

The reference has no graph story at all (its pipeline is scan→normalize→
write, retrieval.py / normalization.py); these ops cover the
entity-relationship analyses a corpus/warehouse team runs on the same data:
"how concentrated is the supplier base", "which co-supply cliques exist",
"which trade partners dominate flow".

Scale shape (the 100-TB question): every op follows the same two-stage
pattern — ONE distributed pass over the fact table collapses it to an
edge list keyed on entities (shuffle on the edge key, two-phase count),
and all graph math after that runs on the edge list, whose size is bounded
by entity cardinality, not fact rows.  Iteration (PageRank) stays in
DataFrame land — no ``collect()``; the driver only composes plans, exactly
like ``dedup_connected_groups``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table

# Size-aware iteration layout (round-3 verdict #2): below this many rows a
# graph-iteration state collapses to ONE partition (one task per round, no
# scheduling of 31 empty tasks); above it, state is hash-partitioned on its
# join key so a 10⁸-vertex supplier graph never becomes a one-task
# straggler.  Env override exists so tests/probes can force the partitioned
# path at small sf.
GRAPH_ROWS_PER_PARTITION = 250_000


def _graph_small_limit() -> int:
    return int(os.environ.get("SPARK_GRAFT_GRAPH_SMALL_LIMIT",
                              GRAPH_ROWS_PER_PARTITION))


def _iter_layout(df: DataFrame, n_rows: int, *keys: str) -> DataFrame:
    """Lay out an iteration-state DataFrame by size: one partition while
    the state fits comfortably in a single task, hash-partitioned on the
    iteration join key once it doesn't.  Both paths are plan-gated in
    tests/test_plans.py."""
    limit = _graph_small_limit()
    if n_rows <= limit:
        return df.coalesce(1)  # small-bounded
    n_parts = min(
        max(2, -(-n_rows // max(1, GRAPH_ROWS_PER_PARTITION))),
        df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(n_parts, *[F.col(k) for k in keys])


def _part_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part→supplier bipartite edges from lineitem.  The DISTINCT
    is a two-phase hash aggregate on the composite key — partial dedup
    happens map-side, so the shuffle carries edges, not fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").distinct()


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the part side of the part–supplier bipartite
    graph: how many parts have exactly d distinct suppliers.

    Two chained aggregations, both two-phase; output cardinality is the
    number of distinct degrees (tiny at any scale)."""
    edges = _part_supplier_edges(spark, sf_dir)
    deg = edges.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_parts"))
            .orderBy("degree"))


def _co_supply_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-supply edges (u < v orientation) weighted by the
    number of distinct parts both suppliers serve.

    The self-join is per-part: cost is sum over parts of C(k_p, 2) where
    k_p is suppliers-per-part — bounded by the catalog's fan-out (TPC-H
    keeps it ~4), so it scales with |part|, never |lineitem|²."""
    e = _part_supplier_edges(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    return (a.join(b, (F.col("a.l_partkey") == F.col("b.l_partkey"))
                   & (F.col("a.l_suppkey") < F.col("b.l_suppkey")))
            .groupBy(F.col("a.l_suppkey").alias("u"),
                     F.col("b.l_suppkey").alias("v"))
            .agg(F.count(F.lit(1)).alias("co_parts")))


def _strong_co_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strong-tie co-supply edges: pairs at or above the exact 95th
    percentile of co-part weight, persisted — the fact table collapses to
    the pair list ONCE and every downstream branch (threshold, degrees,
    joins) re-reads the materialized lists instead of re-running the
    lineitem scan."""
    pairs = _co_supply_pairs(spark, sf_dir).persist()
    cut = pairs.agg(
        F.expr("percentile(co_parts, 0.95)").alias("cut"))
    return (pairs.crossJoin(F.broadcast(cut))
            .where(F.col("co_parts") >= F.col("cut"))
            .select("u", "v")).persist()


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the strong co-supply graph: keep only pairs whose
    co-part weight is at or above the exact 95th percentile (the "strong
    ties"), then count nodes, edges, wedges (length-2 paths), triangles,
    and the global clustering coefficient.

    The percentile threshold (not a global rank) keeps this scale-safe:
    ``percentile`` is a distributed aggregate, so no single-reducer sort of
    the full pair list.  Triangles use the classic oriented edge-join
    (u<v<w counted exactly once); wedges are sum over nodes of C(deg, 2).
    Both engines apply the identical interpolated-percentile cutoff, so
    the edge set — and therefore every count — is deterministic."""
    strong = _strong_co_supply(spark, sf_dir)
    deg = (strong.select(F.col("u").alias("node"))
           .unionAll(strong.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) / 2")).cast("bigint").alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"))
    e1, e2, e3 = strong.alias("e1"), strong.alias("e2"), strong.alias("e3")
    tri = (e1.join(e2, F.col("e1.v") == F.col("e2.u"))
           .join(e3, (F.col("e1.u") == F.col("e3.u"))
                 & (F.col("e2.v") == F.col("e3.v")))
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    edges_cnt = strong.agg(F.count(F.lit(1)).alias("n_edges"))
    return (wedges.crossJoin(edges_cnt).crossJoin(tri)
            .select(
                "n_nodes", "n_edges", "n_wedges", "n_triangles",
                F.round(F.when(F.col("n_wedges") > 0,
                               3.0 * F.col("n_triangles") / F.col("n_wedges"))
                        .otherwise(F.lit(0.0)), 4).alias("clustering")))


def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 power iterations) over the nation-level
    trade graph: edge cust_nation → supp_nation weighted by lineitem count,
    derived from the full fact join.

    The expensive stage is the ONE distributed fact-table join+aggregate
    that collapses ~100 TB of lineitem into a |nation|² edge list; the
    power iteration then runs on that tiny edge list as five composed
    DataFrame join-aggregates — the driver never materializes ranks
    (no collect), it only builds the plan, so the same code works when the
    graph is a million nodes.  Dangling-node mass is deliberately NOT
    redistributed (pure  r' = 0.15/N + 0.85·Σ_in p·r ) so the formula is
    bit-identical to the SQL oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_name").alias("src"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("dst"))
    # shuffle_hash on the fact joins: orders/customer scale with the
    # corpus (r9 sf3 audit: 290 MiB AQE broadcast, over the audit bound)
    edges = (li.join(orders.hint("shuffle_hash"),
                     li.l_orderkey == orders.o_orderkey)
             .join(cust.hint("shuffle_hash"),
                   orders.o_custkey == cust.c_custkey)
             .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
             .join(supp, li.l_suppkey == supp.s_suppkey)
             .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
             # collapse the fact table ONCE: the iteration below branches
             # off this tiny edge list 7+ times; without materialization
             # every branch would re-run the full lineitem join.  The
             # edge list is bounded by |nation|² — one partition, so the
             # five iteration stages don't schedule 64 empty tasks each.
             # localCheckpoint (r15): every iteration-invariant table is
             # materialized ONCE — as a lineage-cut leaf, not a cached
             # subtree — because a cached subtree is re-REFERENCED (and its
             # exchanges re-planned) by all five iterations, which r15
             # measured as 27 exchanges / 187 broadcast builds in one plan.
             .coalesce(1)  # small-bounded
             .localCheckpoint().coalesce(1))  # small-bounded
    outw = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    trans = (edges.join(outw.hint("shuffle_hash"), "src")
             .select("src", "dst",
                     (F.col("w").cast("double") / F.col("tot")).alias("p"))
             .coalesce(1).localCheckpoint().coalesce(1))  # small-bounded
    nodes = (edges.select(F.col("src").alias("n"))
             .union(edges.select(F.col("dst").alias("n"))).distinct())
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    # node axis + node count staged together: saves one crossJoin+broadcast
    # build per iteration (nn is iteration-invariant)
    base = (nodes.crossJoin(F.broadcast(nn)).select("n", "cnt")
            .coalesce(1).localCheckpoint().coalesce(1))  # small-bounded
    r = base.select("n", (F.lit(1.0) / F.col("cnt")).alias("r"))
    # single-partition SHUFFLE_HASH joins instead of per-iteration
    # broadcasts (r15, guide §2.4/§3): each F.broadcast(r)/F.broadcast(
    # inflow) was a separate broadcast-exchange build job per iteration
    # (~11 per call) for ≤|nation|-row tables that already sit in ONE
    # partition; the hinted hash join needs no exchange build at all.
    # Same-window A/B: 5.7 → 2.8 s warm at sf0.1, identical output rows.
    # At a million nodes the same plan degrades gracefully: the hint keys
    # the join on src/n hash partitioning, exactly like the CC/LPA loops.
    for _ in range(5):
        inflow = (trans.join(r.hint("shuffle_hash"), trans.src == r.n)
                  .groupBy("dst")
                  .agg(F.sum(F.col("p") * F.col("r")).alias("inflow")))
        r = (base.join(inflow.hint("shuffle_hash"),
                       base.n == inflow.dst, "left")
             .select(F.col("n"),
                     (F.lit(0.15) / F.col("cnt")
                      + F.lit(0.85) * F.coalesce(F.col("inflow"),
                                                 F.lit(0.0))).alias("r")))
    return (r.select(F.col("n").alias("nation"),
                     F.round("r", 4).alias("pagerank"))
            .orderBy("nation"))


def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first k-hop reachability (k ≤ 3) from the lowest-id node of
    the strong co-supply graph: every reachable supplier with its minimum
    hop distance — the blast-radius query ("if this supplier fails, who
    is 1, 2, 3 tiers away").

    Frontier expansion is iterative DataFrame joins against the persisted
    symmetric edge list (the same shape dedup_connected_groups uses); the
    driver composes k plans, never holds vertices.  Each hop's frontier
    joins edges once — cost is O(frontier × avg-degree) per hop, the BFS
    optimum.  The edge list's layout is size-aware (``_iter_layout``):
    one partition while supplier-bounded, hash-partitioned on ``src`` when
    the entity set grows with the corpus — never a one-task straggler."""
    strong = _strong_co_supply(spark, sf_dir)
    n_sym = 2 * strong.count()  # driver-bounded: one count of the edge list
    sym = _iter_layout(
        strong.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(strong.select(F.col("v").alias("src"),
                                F.col("u").alias("dst"))),
        n_sym, "src").persist()
    seed = sym.agg(F.min("src").alias("node"))
    # each frontier is localCheckpoint-ed so hop k's plan joins a
    # materialized node list instead of re-planning (and re-running) the
    # whole BFS prefix — lineage stays O(1) per hop instead of O(k)
    reached = seed.select("node", F.lit(0).alias("hops")).localCheckpoint()
    frontier = reached
    for k in (1, 2, 3):
        step = (sym.join(F.broadcast(frontier),
                         sym.src == frontier.node)
                .select(F.col("dst").alias("node"),
                        F.lit(k).alias("hops"))
                .distinct()
                .localCheckpoint())
        reached = reached.unionAll(step)
        frontier = step
    return (reached.groupBy("node").agg(F.min("hops").alias("min_hops"))
            .where(F.col("min_hops") > 0)
            .orderBy("node"))


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the strong co-supply graph: the Pearson
    correlation of endpoint degrees over symmetrized edges — do
    well-connected suppliers tie to other hubs (r > 0) or to the
    periphery (r < 0)?

    Degrees come from one aggregate over the persisted edge list; the
    correlation is one algebraic aggregate over edges joined to the
    (broadcastable, |nodes|-sized) degree table twice."""
    strong = _strong_co_supply(spark, sf_dir)
    sym = (strong.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionAll(strong.select(F.col("v").alias("a"),
                                   F.col("u").alias("b"))))
    deg = (sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
           .withColumnRenamed("a", "node"))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # corr via try_divide on the covariance form: a regular (e.g. complete)
    # graph has constant degrees → zero variance, where ANSI corr raises
    # DIVIDE_BY_ZERO but the statistic is properly undefined (NULL, as
    # DuckDB's CORR returns)
    corr = F.expr("try_divide(covar_samp(deg_a, deg_b),"
                  " stddev_samp(deg_a) * stddev_samp(deg_b))")
    return (sym.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
            .agg(F.count(F.lit(1)).alias("n_directed_edges"),
                 F.round(corr, 4).alias("assortativity")))


def graph_component_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component size distribution of the strong co-supply
    graph: how many components of each size exist — the shape question
    behind "is the supplier network one giant cluster or many cliques".

    Same iterative min-label propagation as ``dedup_connected_groups``
    (hash-join connected components, executor-side state, driver checks
    only the converged flag), but over supplier ties instead of near-dup
    pairs, rolled up twice: labels → component sizes → size histogram.
    The strong-tie edge list is bounded by |supplier|, so every iteration
    is a small-join — at 100 TB of facts the component math never touches
    the fact table again."""
    strong = _strong_co_supply(spark, sf_dir)
    # size-aware layout (_iter_layout): ONE partition while the strong
    # graph is small (one task per round, not 32 mostly-empty ones —
    # the small-graph discipline graph_pagerank_trade uses), hash-
    # partitioned on the join key once the entity set outgrows a task
    n_sym = 2 * strong.count()  # driver-bounded: one count of the edge list
    sym = _iter_layout(
        strong.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(strong.select(F.col("v").alias("src"),
                                F.col("u").alias("dst"))),
        n_sym, "dst").persist()
    nodes = (sym.select(F.col("src").alias("node")).distinct())
    # localCheckpoint (not persist) each round: the label state is
    # self-referential, so without lineage truncation the logical plan
    # doubles every iteration and Catalyst re-analysis — not the data —
    # dominates the runtime.  At cluster scale this becomes a reliable
    # checkpoint to cut both lineage and recovery cost.
    labels = _iter_layout(nodes.withColumn("group_id", F.col("node")),
                          n_sym // 2, "node").localCheckpoint()
    # propagate + POINTER-JUMP each round: adopting the neighbor minimum
    # alone needs diameter iterations (a path graph would need |V|); the
    # extra self-join label := label(label) halves the remaining distance
    # every pass, so convergence is O(log diameter)
    for _ in range(12):
        nmin = (sym.join(labels, sym.dst == labels.node)
                .groupBy("src").agg(F.min("group_id").alias("nmin")))
        stepped = (labels.join(nmin, labels.node == nmin.src, "left")
                   .select("node",
                           F.least("group_id", "nmin").alias("group_id"),
                           (F.col("nmin") < F.col("group_id")).alias("chg")))
        parent = stepped.select(F.col("node").alias("p_node"),
                                F.col("group_id").alias("p_label"))
        new_labels = _iter_layout(
            stepped.join(parent,
                         stepped.group_id == parent.p_node, "left")
            .select("node",
                    F.least("group_id",
                            F.coalesce("p_label", "group_id"))
                    .alias("group_id"), "chg"),
            n_sym // 2, "node").localCheckpoint()
        changed = new_labels.where("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    sizes = labels.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("component_size"))
    return (sizes.groupBy("component_size")
            .agg(F.count(F.lit(1)).alias("n_components"))
            .orderBy("component_size"))


def graph_link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the strong co-supply graph: for the top-20
    NON-adjacent supplier pairs, the three classic neighborhood scores —
    common-neighbor count, neighbor-set Jaccard, and Adamic-Adar
    (Σ 1/ln(deg) over shared neighbors, which discounts promiscuous hubs).

    Scale shape: candidates come from the length-2-path join (cost
    Σ_x deg(x)² — bounded by the strong graph's degree distribution, not
    fact rows), existing edges are removed with one anti-join, and the
    Adamic-Adar term is precomputed per NODE in integer basis points so
    the per-pair score is an exact integer sum (no float-summation order
    sensitivity, the discipline every oracle-paired float op here
    follows).  Jaccard is integer-DIV basis points for the same reason.
    """
    strong = _strong_co_supply(spark, sf_dir)
    sym = (strong.select(F.col("u").alias("src"), F.col("v").alias("dst"))
           .unionAll(strong.select(F.col("v").alias("src"),
                                   F.col("u").alias("dst"))))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # a common neighbor always has deg >= 2 (it touches both endpoints),
    # but ANSI mode evaluates the term for deg-1 leaves too — guard it
    aa = deg.select("src", F.when(F.col("deg") >= 2,
                                  F.round(10000 / F.log("deg")))
                    .otherwise(F.lit(0)).cast("bigint").alias("aa_bp"))
    s1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("x"))
    s2 = sym.select(F.col("src").alias("x2"), F.col("dst").alias("b"))
    cand = (s1.join(s2, (F.col("x") == F.col("x2"))
                    & (F.col("a") < F.col("b")))
            .join(strong.select(F.col("u").alias("a"),
                                F.col("v").alias("b")),
                  ["a", "b"], "left_anti"))
    scored = (cand.join(aa.withColumnRenamed("src", "x"), "x")
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("common_neighbors"),
                   F.sum("aa_bp").alias("aa_sum")))
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    return (scored.join(da, "a").join(db, "b")
            .selectExpr(
                "a AS supp_a", "b AS supp_b", "common_neighbors",
                "((10000 * common_neighbors) DIV"
                " (deg_a + deg_b - common_neighbors))"
                " / CAST(10000 AS DOUBLE) AS jaccard",
                "aa_sum / CAST(10000 AS DOUBLE) AS adamic_adar")
            .orderBy(F.col("common_neighbors").desc(), "supp_a", "supp_b")
            .limit(20))


LPA_ITERS = 3  # fixed synchronous rounds — deterministic, oracle-replayable


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation on the strong
    co-supply graph: every node starts as its own label; each round it
    adopts the most frequent label among its neighbors, ties broken by the
    smallest label — the deterministic variant of LPA (Raghavan et al.),
    run for a fixed LPA_ITERS rounds so the result is exactly replayable
    (and hence SQL-oracle-able, unlike randomized LPA).

    Scale shape: each round is one join edge→labels + one two-phase count
    + one per-node window pick, all keyed on node ids — cost ∝ |edges| per
    round, bounded by entity cardinality (the fact table collapsed to the
    edge list once, in ``_strong_co_supply``).  Like the other iterative
    ops, each round's labels are localCheckpoint-ed: hop k joins a
    materialized label table, keeping lineage O(1) per round.  Output is
    the community-size histogram keyed by final label."""
    from pyspark.sql import Window as W

    strong = _strong_co_supply(spark, sf_dir)
    sym = (strong.select(F.col("u").alias("src"), F.col("v").alias("dst"))
           .unionAll(strong.select(F.col("v").alias("src"),
                                   F.col("u").alias("dst")))
           .persist())
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())
    pick = W.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(LPA_ITERS):
        votes = (sym.join(labels, sym.dst == labels.node)
                 .groupBy(sym.src.alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        labels = (votes.withColumn("rn", F.row_number().over(pick))
                  .where(F.col("rn") == 1)
                  .select("node", "label").localCheckpoint())
    return (labels.groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("community"))


def graph_shortest_paths_weighted(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Bounded weighted shortest paths (Bellman–Ford, 4 relaxation
    rounds) from the lowest-id supplier of the strong co-supply graph.
    Edge length is inversely proportional to tie strength —
    ``max(1, round(10000 / co_parts))`` — so strong ties are short, and
    the integer weights make every distance byte-identical on any engine.

    Iteration discipline matches ``graph_khop_reachability``: the fact
    table collapses to the size-aware (``_iter_layout``) symmetric edge
    list ONCE; each round joins it to the broadcast vertex-bounded
    distance table, localCheckpoints (round k's plan is O(1), not O(k)),
    and a two-phase min-aggregate closes the round — never a one-task
    straggler, never a driver-side frontier."""
    pairs = _co_supply_pairs(spark, sf_dir).persist()
    cut = pairs.agg(F.expr("percentile(co_parts, 0.95)").alias("cut"))
    w = F.greatest(F.lit(1).cast("long"),
                   F.round(F.lit(10000.0) / F.col("co_parts")).cast("long"))
    strong = (pairs.crossJoin(F.broadcast(cut))
              .where(F.col("co_parts") >= F.col("cut"))
              .select("u", "v", w.alias("w")))
    n_sym = 2 * strong.count()  # driver-bounded: one count of the edge list
    sym = _iter_layout(
        strong.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(strong.select(F.col("v").alias("src"),
                                F.col("u").alias("dst"), "w")),
        n_sym, "src").persist()
    dist = (sym.agg(F.min("src").alias("node"))
            .select("node", F.lit(0).cast("long").alias("dist"))
            .localCheckpoint())
    for _ in range(4):
        relax = (sym.join(F.broadcast(dist), sym.src == dist.node)
                 .select(F.col("dst").alias("node"),
                         (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.select("node", "dist").unionAll(relax)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint())
    return (dist.select(F.col("node").alias("supplier"), "dist")
            .orderBy("supplier"))


QUERIES = {
    "graph_shortest_paths_weighted": graph_shortest_paths_weighted,
    "graph_label_propagation": graph_label_propagation,
    "graph_component_size_dist": graph_component_size_dist,
    "graph_link_prediction_scores": graph_link_prediction_scores,
    "graph_khop_reachability": graph_khop_reachability,
    "graph_assortativity": graph_assortativity,
    "graph_degree_distribution": graph_degree_distribution,
    "graph_triangle_count": graph_triangle_count,
    "graph_pagerank_trade": graph_pagerank_trade,
}

_PR_EDGES = """
edges AS MATERIALIZED (
    SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
),
outw AS MATERIALIZED (SELECT src, SUM(w) AS tot FROM edges GROUP BY 1),
trans AS MATERIALIZED (
    SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.tot AS p
    FROM edges e JOIN outw o ON e.src = o.src
),
nodes AS MATERIALIZED (
    SELECT DISTINCT src AS n FROM edges
    UNION
    SELECT DISTINCT dst AS n FROM edges
),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes)
"""

_PR_STEP = """
r{next} AS (
    SELECT nd.n, 0.15 / nn.cnt + 0.85 * COALESCE(i.inflow, 0) AS r
    FROM nodes nd CROSS JOIN nn
    LEFT JOIN (
        SELECT t.dst, SUM(t.p * pr.r) AS inflow
        FROM trans t JOIN r{cur} pr ON t.src = pr.n
        GROUP BY t.dst
    ) i ON nd.n = i.dst
)
"""

_PR_SQL = ("WITH " + _PR_EDGES + ",\n"
           + "r0 AS (SELECT n, 1.0 / cnt AS r FROM nodes CROSS JOIN nn),\n"
           + ",\n".join(_PR_STEP.format(cur=i, next=i + 1) for i in range(5))
           + """
SELECT n AS nation, ROUND(r, 4) AS pagerank
FROM r5 ORDER BY nation
""")

ORACLE = {
    "graph_shortest_paths_weighted": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v,
                   GREATEST(CAST(1 AS BIGINT),
                            CAST(ROUND(10000.0 / co_parts) AS BIGINT)) AS w
            FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ),
        sym AS MATERIALIZED (
            SELECT u AS src, v AS dst, w FROM strong
            UNION ALL
            SELECT v AS src, u AS dst, w FROM strong
        ),
        d0 AS MATERIALIZED (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist FROM sym),
        d1 AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
                   SELECT node, dist FROM d0
                   UNION ALL
                   SELECT sym.dst, d0.dist + sym.w
                   FROM sym JOIN d0 ON sym.src = d0.node
               ) GROUP BY node),
        d2 AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
                   SELECT node, dist FROM d1
                   UNION ALL
                   SELECT sym.dst, d1.dist + sym.w
                   FROM sym JOIN d1 ON sym.src = d1.node
               ) GROUP BY node),
        d3 AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
                   SELECT node, dist FROM d2
                   UNION ALL
                   SELECT sym.dst, d2.dist + sym.w
                   FROM sym JOIN d2 ON sym.src = d2.node
               ) GROUP BY node),
        d4 AS (SELECT node, MIN(dist) AS dist FROM (
                   SELECT node, dist FROM d3
                   UNION ALL
                   SELECT sym.dst, d3.dist + sym.w
                   FROM sym JOIN d3 ON sym.src = d3.node
               ) GROUP BY node)
        SELECT node AS supplier, dist FROM d4 ORDER BY supplier
    """,
    "graph_label_propagation": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ), cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ), sym AS MATERIALIZED (
            SELECT u AS src, v AS dst FROM strong
            UNION ALL
            SELECT v AS src, u AS dst FROM strong
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
        c1 AS (
            SELECT s.src AS node, l.label, COUNT(*) AS c
            FROM sym s JOIN l0 l ON s.dst = l.node GROUP BY 1, 2
        ), l1 AS (
            SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY c DESC, label) AS rn FROM c1)
            WHERE rn = 1
        ),
        c2 AS (
            SELECT s.src AS node, l.label, COUNT(*) AS c
            FROM sym s JOIN l1 l ON s.dst = l.node GROUP BY 1, 2
        ), l2 AS (
            SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY c DESC, label) AS rn FROM c2)
            WHERE rn = 1
        ),
        c3 AS (
            SELECT s.src AS node, l.label, COUNT(*) AS c
            FROM sym s JOIN l2 l ON s.dst = l.node GROUP BY 1, 2
        ), l3 AS (
            SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY c DESC, label) AS rn FROM c3)
            WHERE rn = 1
        )
        SELECT label AS community, COUNT(*) AS n_members
        FROM l3 GROUP BY 1 ORDER BY 1
    """,
    "graph_component_size_dist": """
        WITH RECURSIVE e AS MATERIALIZED (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ), cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ), sym AS MATERIALIZED (
            SELECT u AS src, v AS dst FROM strong
            UNION ALL
            SELECT v AS src, u AS dst FROM strong
        ), nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
        reach AS (
            SELECT node, node AS r FROM nodes
            UNION
            SELECT reach.node, sym.dst AS r
            FROM reach JOIN sym ON reach.r = sym.src
        ), labels AS (
            SELECT node, MIN(r) AS group_id FROM reach GROUP BY node
        ), sizes AS (
            SELECT group_id, COUNT(*) AS component_size
            FROM labels GROUP BY 1
        )
        SELECT component_size, COUNT(*) AS n_components
        FROM sizes GROUP BY 1 ORDER BY 1
    """,
    "graph_degree_distribution": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        d AS (SELECT l_partkey, COUNT(*) AS degree FROM e GROUP BY 1)
        SELECT degree, COUNT(*) AS n_parts
        FROM d GROUP BY 1 ORDER BY 1
    """,
    "graph_assortativity": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ),
        sym AS MATERIALIZED (
            SELECT u AS a, v AS b FROM strong
            UNION ALL
            SELECT v AS a, u AS b FROM strong
        ),
        deg AS (SELECT a AS node, COUNT(*) AS deg FROM sym GROUP BY a)
        SELECT COUNT(*) AS n_directed_edges,
               ROUND(CORR(da.deg, db.deg), 4) AS assortativity
        FROM sym
        JOIN deg da ON sym.a = da.node
        JOIN deg db ON sym.b = db.node
    """,
    "graph_khop_reachability": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ),
        sym AS MATERIALIZED (
            SELECT u AS src, v AS dst FROM strong
            UNION ALL
            SELECT v AS src, u AS dst FROM strong
        ),
        seed AS MATERIALIZED (SELECT MIN(src) AS node FROM sym),
        h1 AS MATERIALIZED (SELECT DISTINCT dst AS node
               FROM sym JOIN seed ON sym.src = seed.node),
        h2 AS MATERIALIZED (SELECT DISTINCT dst AS node
               FROM sym JOIN h1 ON sym.src = h1.node),
        h3 AS MATERIALIZED (SELECT DISTINCT dst AS node
               FROM sym JOIN h2 ON sym.src = h2.node),
        all_h AS (
            SELECT node, 0 AS hops FROM seed
            UNION ALL SELECT node, 1 FROM h1
            UNION ALL SELECT node, 2 FROM h2
            UNION ALL SELECT node, 3 FROM h3
        )
        SELECT node, MIN(hops) AS min_hops
        FROM all_h GROUP BY node
        HAVING MIN(hops) > 0
        ORDER BY node
    """,
    "graph_triangle_count": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ),
        deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT u AS node FROM strong
                UNION ALL
                SELECT v AS node FROM strong
            ) GROUP BY 1
        ),
        wd AS (
            SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
                   COUNT(*) AS n_nodes
            FROM deg
        ),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM strong e1
            JOIN strong e2 ON e1.v = e2.u
            JOIN strong e3 ON e1.u = e3.u AND e2.v = e3.v
        ),
        ec AS (SELECT COUNT(*) AS n_edges FROM strong)
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               ROUND(CASE WHEN n_wedges > 0
                     THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 4)
                   AS clustering
        FROM wd CROSS JOIN ec CROSS JOIN tri
    """,
    "graph_pagerank_trade": _PR_SQL,
    "graph_link_prediction_scores": """
        WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS co_parts
            FROM e a JOIN e b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        cut AS MATERIALIZED (SELECT QUANTILE_CONT(co_parts, 0.95) AS cut FROM pairs),
        strong AS MATERIALIZED (
            SELECT u, v FROM pairs CROSS JOIN cut WHERE co_parts >= cut
        ),
        sym AS MATERIALIZED (
            SELECT u AS src, v AS dst FROM strong
            UNION ALL
            SELECT v AS src, u AS dst FROM strong
        ),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
        aa AS (
            -- deg >= 2 guard mirrors the Spark side: under IEEE float
            -- semantics (DuckDB >= 1.1) 10000/LN(1) is inf and the CAST
            -- raises; deg-1 leaves never join as common neighbors anyway
            SELECT src, CASE WHEN deg >= 2
                             THEN CAST(ROUND(10000 / LN(deg)) AS BIGINT)
                             ELSE 0 END AS aa_bp
            FROM deg
        ),
        cand AS (
            SELECT s1.src AS a, s1.dst AS x, s2.dst AS b
            FROM sym s1 JOIN sym s2
              ON s1.dst = s2.src AND s1.src < s2.dst
            WHERE NOT EXISTS (SELECT 1 FROM strong st
                              WHERE st.u = s1.src AND st.v = s2.dst)
        ),
        scored AS (
            SELECT a, b, COUNT(*) AS common_neighbors,
                   SUM(aa_bp) AS aa_sum
            FROM cand JOIN aa ON cand.x = aa.src
            GROUP BY a, b
        )
        SELECT a AS supp_a, b AS supp_b, common_neighbors,
               ((10000 * common_neighbors)
                // (da.deg + db.deg - common_neighbors)) / 10000.0
                   AS jaccard,
               CAST(aa_sum AS BIGINT) / 10000.0 AS adamic_adar
        FROM scored
        JOIN deg da ON scored.a = da.src
        JOIN deg db ON scored.b = db.src
        ORDER BY common_neighbors DESC, supp_a, supp_b
        LIMIT 20
    """,
}
