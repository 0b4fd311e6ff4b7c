"""Invariant tests for the span-dedup / sweep-line / sketch / streak /
attribution / component-size operators.

The oracle gate checks value parity against DuckDB; these tests assert the
DEFINING mathematical properties with independent brute-force formulations
so a shared op+oracle mistake can't hide (same discipline as
test_analytics_math.py).
"""

from __future__ import annotations

from collections import Counter, defaultdict


def test_span_chunks_fraction_bounds_and_counts(spark, sf_dir):
    """Per-doc span counts must equal ceil(n_tokens/10), dup fraction in
    [0,1], and a doc whose every span is unique corpus-wide must have
    dup_span_frac == 0."""
    from build_pipeline_with_apache_beam_spark.operators.dedup import (
        dedup_span_chunks,
    )

    rows = dedup_span_chunks(spark, sf_dir).collect()
    docs = {r["doc_id"]: r for r in rows}
    assert docs, "no documents"
    from build_pipeline_with_apache_beam_spark.catalog import load_table

    for d in load_table(spark, sf_dir, "documents").collect():
        toks = d["text"].split(" ")
        expect_spans = -(-len(toks) // 10)  # ceil
        r = docs[d["doc_id"]]
        assert r["n_spans"] == expect_spans, d["doc_id"]
        assert 0 <= r["n_dup_spans"] <= r["n_spans"]
        assert 0.0 <= r["dup_span_frac"] <= 1.0


def test_span_chunks_matches_bruteforce(spark, sf_dir):
    """Duplicated-span counts recomputed with a plain-Python span index."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.dedup import (
        dedup_span_chunks,
    )

    docs = load_table(spark, sf_dir, "documents").collect()
    span_docs: dict[str, set] = defaultdict(set)
    per_doc: dict[int, list] = {}
    for d in docs:
        toks = d["text"].split(" ")
        spans = [" ".join(toks[i:i + 10]) for i in range(0, len(toks), 10)]
        per_doc[d["doc_id"]] = spans
        for s in spans:
            span_docs[s].add(d["doc_id"])
    for r in dedup_span_chunks(spark, sf_dir).collect():
        spans = per_doc[r["doc_id"]]
        n_dup = sum(1 for s in spans if len(span_docs[s]) > 1)
        assert r["n_dup_spans"] == n_dup, r["doc_id"]


def test_active_intervals_sweep_line_invariants(spark, sf_dir):
    """The active count can never be negative, must end at zero after the
    last close, and must equal the brute-force per-day stabbing count."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.relational import (
        timeseries_active_intervals,
    )
    from pyspark.sql import functions as F

    rows = timeseries_active_intervals(spark, sf_dir).collect()
    assert rows and all(r["n_active"] >= 0 for r in rows)
    assert rows[-1]["n_active"] == 0  # day after the last close

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    closed = {r["l_orderkey"]: r["close"] for r in
              li.groupBy("l_orderkey")
              .agg(F.max(F.to_date("l_shipdate")).alias("close")).collect()}
    spans = [(r["o_orderdate"].date(),
              max(closed[r["o_orderkey"]], r["o_orderdate"].date()))
             for r in orders.collect() if r["o_orderkey"] in closed]
    probe = sorted({r["day"] for r in rows})[len(rows) // 2]
    brute = sum(1 for o, c in spans if o <= probe <= c)
    got = next(r["n_active"] for r in rows if r["day"] == probe)
    assert got == brute


def test_count_min_sketch_never_undercounts(spark, sf_dir):
    """CMS law: estimate ≥ exact count for every key, and with 1024 cells
    over this corpus the heavy hitters should be exact or near-exact."""
    from build_pipeline_with_apache_beam_spark.operators.relational import (
        agg_count_min_sketch,
    )

    rows = agg_count_min_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], r
        assert r["overcount"] == r["cms_estimate"] - r["exact_n"]


def test_gaps_and_islands_matches_bruteforce(spark, sf_dir):
    """Streak structure recomputed with a plain-Python consecutive-day
    scan over each user's distinct active days."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        window_gaps_and_islands,
    )

    ev = load_table(spark, sf_dir, "events").collect()
    days = defaultdict(set)
    for e in ev:
        days[e["user_id"]].add(e["ts"].date())
    for r in window_gaps_and_islands(spark, sf_dir).collect():
        ds = sorted(days[r["user_id"]])
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert r["n_islands"] == len(streaks), r["user_id"]
        assert r["longest_streak"] == max(streaks)
        assert r["active_days"] == len(ds)


def test_last_touch_attribution_conserves_purchases(spark, sf_dir):
    """Every purchase is attributed exactly once (buckets partition the
    purchase set), and the per-bucket counts match a brute-force replay
    of each user's ordered stream."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        events_attribution_last_touch,
    )

    ev = load_table(spark, sf_dir, "events").collect()
    streams = defaultdict(list)
    for e in ev:
        streams[e["user_id"]].append(e)
    brute = Counter()
    n_purchases = 0
    for es in streams.values():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        touch = None
        for e in es:
            if e["event_type"] == "purchase":
                brute[touch or "(none)"] += 1
                n_purchases += 1
            else:
                touch = e["event_type"]
    rows = events_attribution_last_touch(spark, sf_dir).collect()
    assert sum(r["n_conversions"] for r in rows) == n_purchases
    assert {r["touch_type"]: r["n_conversions"] for r in rows} == dict(brute)


def test_component_sizes_partition_the_node_set(spark, sf_dir):
    """Component sizes must sum to the node count of the strong graph and
    match a brute-force union-find over the same edges."""
    from build_pipeline_with_apache_beam_spark.operators.graph import (
        _strong_co_supply,
        graph_component_size_dist,
    )

    edges = [(r["u"], r["v"])
             for r in _strong_co_supply(spark, sf_dir).collect()]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    sizes = Counter(find(x) for x in list(parent))
    brute = Counter(sizes.values())
    got = {r["component_size"]: r["n_components"]
           for r in graph_component_size_dist(spark, sf_dir).collect()}
    assert got == dict(brute)


def test_minhash_eval_precision_law(spark, sf_dir):
    """LSH predictions are exact-verified, so truth must contain every
    prediction (precision 1.0 whenever predictions exist), and all three
    counts must be consistent."""
    from build_pipeline_with_apache_beam_spark.operators.dedup import (
        minhash_eval_detail,
    )

    r = minhash_eval_detail(spark, sf_dir).collect()[0]
    assert r["n_hits"] <= min(r["n_truth_pairs"], r["n_predicted_pairs"])
    if r["n_predicted_pairs"]:
        assert r["precision"] == 1.0     # predictions ⊆ truth by design
    if r["n_truth_pairs"]:
        assert 0.0 <= r["recall"] <= 1.0


def test_span_corruption_matches_bruteforce_md5(spark, sf_dir):
    """Mask statistics recomputed with Python hashlib over the same
    deterministic md5(doc_id:pos) rule."""
    import hashlib

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        corpus_span_corruption,
    )

    docs = {d["doc_id"]: d["text"]
            for d in load_table(spark, sf_dir, "documents").collect()}
    for r in corpus_span_corruption(spark, sf_dir).collect():
        n = len(docs[r["doc_id"]].split(" "))
        mask = [int(hashlib.md5(f"{r['doc_id']}:{p}".encode())
                    .hexdigest()[:2], 16) < 38 for p in range(1, n + 1)]
        n_spans = sum(1 for i, m in enumerate(mask)
                      if m and (i == 0 or not mask[i - 1]))
        assert r["n_tokens"] == n
        assert r["n_masked"] == sum(mask)
        assert r["n_mask_spans"] == n_spans


def test_heavy_hitters_exact_equals_full_groupby(spark, sf_dir):
    """The two-pass MG output must be IDENTICAL to the brute-force full
    count — the exactness guarantee the op claims."""
    from collections import Counter

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.relational import (
        agg_heavy_hitters_exact,
    )

    cnt = Counter()
    for d in load_table(spark, sf_dir, "documents").collect():
        cnt.update(d["text"].split(" "))
    total = sum(cnt.values())
    brute = {t: c for t, c in cnt.items() if c * 50 > total}
    got = {r["token"]: r["n_occurrences"]
           for r in agg_heavy_hitters_exact(spark, sf_dir).collect()}
    assert got == brute


def test_pca_power_iteration_rayleigh_monotone(spark, sf_dir):
    """For a PSD covariance, power-iteration Rayleigh quotients are
    non-decreasing and can never exceed the total variance (trace)."""
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        embedding_pca_power_iteration,
    )

    rows = sorted(embedding_pca_power_iteration(spark, sf_dir).collect(),
                  key=lambda r: r["iteration"])
    assert len(rows) == 8
    assert all(r["rayleigh_nondecreasing"] for r in rows)
    assert all(r["explained_var_in_unit"] for r in rows)
    assert all(r["total_var_4dp"] > 0 for r in rows)


def test_logreg_training_loss_decreases(spark, sf_dir):
    """Batch gradient descent at this fixed learning rate must reduce the
    log-loss every iteration and end well above chance accuracy."""
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        corpus_quality_logreg_train,
    )

    rows = sorted(corpus_quality_logreg_train(spark, sf_dir).collect(),
                  key=lambda r: r["iteration"])
    assert all(r["loss_decreasing"] for r in rows)
    assert all(r["final_acc_beats_majority"] for r in rows)
    assert all(0 < r["pos_bp"] < 10000 for r in rows)  # learnable labels


def test_recursive_cte_matches_driver_loop_bfs(spark, sf_dir):
    """The declarative WITH RECURSIVE BFS must agree with a brute-force
    Python BFS over the same thresholded edge list."""
    from collections import deque

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.relational import (
        TRADE_EDGE_MIN,
        sql_recursive_cte,
    )
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("ck"),
                       F.col("n_name").alias("src"))
    sn = nation.select(F.col("n_nationkey").alias("sk"),
                       F.col("n_name").alias("dst"))
    edges = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .join(cust, orders.o_custkey == cust.c_custkey)
             .join(cn, cust.c_nationkey == F.col("ck"))
             .join(supp, li.l_suppkey == supp.s_suppkey)
             .join(sn, supp.s_nationkey == F.col("sk"))
             .where(F.col("src") != F.col("dst"))
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
             .where(F.col("w") >= TRADE_EDGE_MIN)).collect()
    adj = defaultdict(list)
    for e in edges:
        adj[e["src"]].append(e["dst"])
    dist = {"NATION_0": 0}
    q = deque([("NATION_0", 0)])
    while q:
        node, h = q.popleft()
        if h >= 3:
            continue
        for nxt in adj[node]:
            if nxt not in dist:
                dist[nxt] = h + 1
                q.append((nxt, h + 1))
    got = {r["nation"]: r["min_hops"]
           for r in sql_recursive_cte(spark, sf_dir).collect()}
    assert got == dist


def test_mmr_rerank_matches_greedy_replay(spark, sf_dir):
    """The distributed MMR must equal a plain-Python greedy replay over
    the same relevance pool, and the first pick per query must be the
    most relevant candidate."""
    import numpy as np

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.similarity import (
        MMR_LAMBDA, MMR_POOL, MMR_SELECT, N_QUERIES, sim_mmr_rerank,
    )

    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    unit = {k: v / np.linalg.norm(v) for k, v in emb.items()}
    got = sim_mmr_rerank(spark, sf_dir).collect()
    by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["query_id"], r["mmr_rank"])):
        by_q[r["query_id"]].append(r["cand_id"])
    assert set(by_q) == set(range(N_QUERIES))
    for qid, picks in by_q.items():
        rel = sorted(((round(float(unit[qid] @ v), 6), -cid, cid)
                      for cid, v in unit.items() if cid != qid),
                     reverse=True)[:MMR_POOL]
        pool = [(cid, r) for r, _, cid in rel]
        selected: list[int] = []
        for _ in range(MMR_SELECT):
            best, best_score = None, -np.inf
            for cid, r in pool:
                if cid in selected:
                    continue
                ms = max((float(unit[cid] @ unit[s]) for s in selected),
                         default=0.0)
                score = MMR_LAMBDA * r - (1 - MMR_LAMBDA) * ms
                if score > best_score + 1e-12:
                    best, best_score = cid, score
            selected.append(best)
        assert picks == selected, (qid, picks, selected)
        # first pick is pure relevance
        assert picks[0] == pool[0][0]


def test_canonical_dedup_keeps_exactly_one_per_cluster(spark, sf_dir):
    """Every cluster keeps exactly one member, the canonical is the
    longest (ties: lowest id), and drops + keeps partition the sample."""
    from build_pipeline_with_apache_beam_spark.operators.dedup import (
        dedup_cluster_canonical,
    )

    rows = dedup_cluster_canonical(spark, sf_dir).collect()
    by_group = defaultdict(list)
    for r in rows:
        by_group[r["group_id"]].append(r)
    for gid, members in by_group.items():
        keeps = [r for r in members if r["keep"]]
        assert len(keeps) == 1, gid
        assert keeps[0]["doc_id"] == keeps[0]["canonical_id"]
        assert all(r["n_members"] == len(members) for r in members)


def test_shard_balance_snake_assignment(spark, sf_dir):
    """Shards must partition the corpus and keep token mass tight: the
    snake assignment's imbalance ratio should stay close to 1."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        N_SHARDS, corpus_shard_balance,
    )

    rows = corpus_shard_balance(spark, sf_dir).collect()
    assert len(rows) == N_SHARDS
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(r["imbalance_ratio"] == rows[0]["imbalance_ratio"]
               for r in rows)
    assert rows[0]["imbalance_ratio"] < 1.2


def test_curriculum_phases_partition_and_positions_dense(spark, sf_dir):
    """Phases 1..4 partition the corpus into near-equal quartiles and
    within-phase positions are dense 1..n."""
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        corpus_curriculum_order,
    )

    rows = corpus_curriculum_order(spark, sf_dir).collect()
    by_phase = defaultdict(list)
    for r in rows:
        by_phase[r["phase"]].append(r["position"])
    assert set(by_phase) <= {1, 2, 3, 4}
    n = len(rows)
    for phase, pos in by_phase.items():
        assert sorted(pos) == list(range(1, len(pos) + 1)), phase
        assert len(pos) >= n // 4 - n // 10  # near-equal quartiles


def test_kmeans_inertia_monotone_nonincreasing(spark, sf_dir):
    """Lloyd's algorithm guarantees assignment-step inertia never
    increases across iterations, and the mean-update step conserves mass
    (Σ n_c·centroid_c reproduces the corpus totals) — both now surfaced
    as oracle-gated booleans (round-4 banded-oracle promotion)."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        KMEANS_ITERS, embedding_kmeans_train,
    )

    rows = sorted(embedding_kmeans_train(spark, sf_dir).collect(),
                  key=lambda r: r["iteration"])
    assert len(rows) == KMEANS_ITERS
    assert all(r["inertia_nonincreasing"] for r in rows)
    assert all(r["mass_conserved"] for r in rows)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert all(r["n_vecs"] == n for r in rows)


def test_kmeans_runs_one_distributed_job_per_iteration(spark, sf_dir):
    """Round-10 verdict #1 regression pin: each Lloyd iteration must be
    ONE action (the (cid, dim) update aggregate also carries the inertia
    sum on its dim==0 slice) — the pre-r11 form ran a second inertia
    collect over the unpersisted assignment join, doubling the dominant
    cost at any scale.  Measured job budget at HEAD: 18 jobs per run
    (6 iteration collects + corpus totals + init, some split into
    map-stage + result jobs by AQE); the two-actions-per-iteration form
    adds ≥6 more collects, so the bound separates them with slack."""
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        embedding_kmeans_train,
    )

    sc = spark.sparkContext
    group = "kmeans-job-budget"
    sc.setJobGroup(group, "one distributed job per Lloyd iteration")
    try:
        embedding_kmeans_train(spark, sf_dir)  # collects internally
    finally:
        sc.setJobGroup("", "")
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    # budget sits midway between the one-action form (18 jobs at HEAD,
    # some split map-stage/result by AQE) and the two-actions-per-iteration
    # form (>= 18+6): slack absorbs AQE job-splitting drift across Spark
    # configs without letting the regression back in (round-11 advice)
    assert 0 < n_jobs <= 23, f"kmeans spawned {n_jobs} jobs (budget 23)"


def test_markov_attribution_probability_laws(spark, sf_dir):
    """Removal effects live in [0,1]; shares are a normalized distribution
    over the non-conversion channels."""
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        events_attribution_markov,
    )

    rows = events_attribution_markov(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["effect_in_unit"] and r["shares_valid"], r
        assert r["channel"] not in ("purchase", "(start)", "(conv)", "(null)")


def test_dataset_card_consistency(spark, sf_dir):
    """Card figures must match independent recomputation from the raw
    documents."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        corpus_dataset_card,
    )

    card = corpus_dataset_card(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").collect()
    assert card["n_docs"] == len(docs)
    assert card["total_tokens"] == sum(len(d["text"].split(" ")) for d in docs)
    assert card["n_unique_texts"] == len({d["text"] for d in docs})
    assert 0.0 <= card["exact_dup_rate"] <= 1.0


def test_delta_ci_matches_bruteforce_formula(spark, sf_dir):
    """Delta-method SE recomputed in plain Python from the per-user pairs;
    CI must bracket the ratio and match to 6dp."""
    import math

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        events_ratio_metric_delta_ci,
    )
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        _bucket_64k,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        _bucket_64k(F.col("user_id").cast("string")).alias("b"),
        "user_id", "value").collect()
    arms = {}
    for r in ev:
        arm = "A" if r["b"] < 32768 else "B"
        key = (arm, r["user_id"])
        x, y = arms.get(key, (0.0, 0.0))
        arms[key] = (x + r["value"], y + 1.0)
    for row in events_ratio_metric_delta_ci(spark, sf_dir).collect():
        pairs = [v for (a, _u), v in arms.items() if a == row["arm"]]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        mx, my = sx / n, sy / n
        vx = sum((x - mx) ** 2 for x, _ in pairs) / (n - 1)
        vy = sum((y - my) ** 2 for _, y in pairs) / (n - 1)
        cxy = sum((x - mx) * (y - my) for x, y in pairs) / (n - 1)
        r_ = sx / sy
        se = math.sqrt((vx + r_ * r_ * vy - 2 * r_ * cxy) / (n * my * my))
        assert row["n_users"] == n
        assert abs(row["ratio"] - r_) < 1e-5
        assert abs(row["se_delta"] - se) < 1e-5
        assert row["ci_lo"] <= row["ratio"] <= row["ci_hi"]


def test_point_in_time_features_no_leakage(spark, sf_dir):
    """Features replayed from each user's ordered stream must match, and
    no feature may count the label event itself or anything after it."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        events_point_in_time_features,
    )

    streams = defaultdict(list)
    for e in load_table(spark, sf_dir, "events").collect():
        streams[e["user_id"]].append(e)
    brute = {}
    for es in streams.values():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        clicks = views = 0
        last_click = None
        for e in es:
            if e["event_type"] == "purchase":
                if last_click is None:
                    micros = None
                else:
                    d = e["ts"] - last_click
                    micros = ((d.days * 86_400 + d.seconds) * 1_000_000
                              + d.microseconds)
                brute[e["event_id"]] = (clicks, views, micros)
            if e["event_type"] == "click":
                clicks += 1
                last_click = e["ts"]
            elif e["event_type"] == "view":
                views += 1
    for r in events_point_in_time_features(spark, sf_dir).collect():
        c, v, m = brute[r["event_id"]]
        assert (r["n_prior_clicks"], r["n_prior_views"]) == (c, v)
        assert r["micros_since_click"] == m


def test_ann_recall_law_and_values(spark, sf_dir):
    """Recall@k in [0,1] per query, n_hit <= n_exact, and recall equals a
    brute-force set comparison of the two registered ops' outputs."""
    from build_pipeline_with_apache_beam_spark.operators.similarity import (
        sim_ann_lsh_topk, sim_ann_recall_eval, sim_cosine_topk,
    )

    exact = defaultdict(set)
    for r in sim_cosine_topk(spark, sf_dir).collect():
        exact[r["query_id"]].add(r["cand_id"])
    ann = defaultdict(set)
    for r in sim_ann_lsh_topk(spark, sf_dir).collect():
        ann[r["query_id"]].add(r["cand_id"])
    rows = sim_ann_recall_eval(spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == set(exact)
    for r in rows:
        hits = len(exact[r["query_id"]] & ann[r["query_id"]])
        assert r["n_hit"] == hits
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_hit"] <= r["n_exact"]


def test_kl_divergence_nonnegative_and_zero_for_corpus_clone(spark, sf_dir):
    """KL ≥ 0 always (Gibbs); near-uniform fixture sources sit close to
    the corpus blend."""
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        corpus_kl_divergence_sources,
    )

    rows = corpus_kl_divergence_sources(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["kl_vs_corpus"] >= -1e-9, r


def test_attribution_markov_purchase_only_stream_is_empty_not_error(
        spark, sf_dir, tmp_path):
    """A stream with no non-purchase event types has no channels to
    credit: the op must return an empty 3-column result, not raise a SQL
    parse error from an empty VALUES list (round-2 ADVICE)."""
    from pyspark.sql import functions as F

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        events_attribution_markov,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase")
    ev.write.parquet(str(tmp_path / "events.parquet"))
    out = events_attribution_markov(spark, str(tmp_path))
    assert out.columns == ["channel", "effect_in_unit", "shares_valid"]
    assert out.count() == 0
