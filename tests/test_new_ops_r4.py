"""Round-4 operator additions: invariants and Python-replay parity
beyond the DuckDB oracle.

The oracle gate proves Spark ≡ SQL; these tests prove the operators mean
what they claim (robust-estimator definitions, rank-statistic laws,
shortest-path optimality, hashing-trick accounting).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _bucket64k(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def test_theil_sen_matches_numpy_replay(spark, sf_dir):
    """The op's slope/intercept must equal the literal definition —
    median of pairwise slopes of daily revenue, median residual —
    recomputed in numpy from the same daily table."""
    import numpy as np

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        agg_theil_sen_slope,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                        .alias("day"))
             .agg(F.sum("value").alias("rev"))).collect()
    series: dict[str, list[tuple[int, float]]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["rev"]))
    out = {r["event_type"]: r
           for r in agg_theil_sen_slope(spark, sf_dir).collect()}
    assert set(out) == set(series)
    for et, pts in series.items():
        pts.sort()
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slopes = [(ys[j] - ys[i]) / (xs[j] - xs[i])
                  for i in range(len(xs)) for j in range(i + 1, len(xs))]
        m = float(np.median(slopes))
        icept = float(np.median(ys - m * xs))
        row = out[et]
        assert row["n_days"] == len(xs)
        assert row["n_pairs"] == len(slopes)
        assert abs(row["theil_sen_slope"] - m) < 1e-3, (et, row, m)
        assert abs(row["intercept"] - icept) < 1e-3, (et, row, icept)


def test_theil_sen_ignores_planted_outlier():
    """Definitional robustness: with ≥3 clean points on an exact line,
    corrupting ONE point must not move the Theil–Sen slope (the median
    of pairwise slopes), while it provably moves the OLS slope."""
    import numpy as np

    xs = np.arange(10, dtype=float)
    ys = 3.0 * xs + 1.0
    ys_bad = ys.copy()
    ys_bad[9] = 1e6
    def ts(y):
        return float(np.median([(y[j] - y[i]) / (xs[j] - xs[i])
                                for i in range(10) for j in range(i + 1, 10)]))
    assert abs(ts(ys) - 3.0) < 1e-12
    assert abs(ts(ys_bad) - 3.0) < 0.4          # robust: barely moves
    ols = np.polyfit(xs, ys_bad, 1)[0]
    assert abs(ols - 3.0) > 1e3                  # OLS: destroyed


def test_mannwhitney_matches_python_replay(spark, sf_dir):
    """u_a and z must equal the textbook midrank computation replayed in
    Python over the same purchase rows and the same md5 arm split; and
    U_A + U_B = n_a · n_b (the rank-sum identity)."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        agg_mannwhitney_u,
    )

    rows = (load_table(spark, sf_dir, "events")
            .where(F.col("event_type") == "purchase")
            .select("user_id", "value").collect())
    vals = sorted((r["value"], _bucket64k(str(r["user_id"])) < 32768)
                  for r in rows)
    n = len(vals)
    # midranks with ties
    r_a = 0.0
    n_a = sum(1 for _, a in vals if a)
    tie_term = 0
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0          # avg of ranks i+1 .. j
        r_a += mid * sum(1 for k in range(i, j) if vals[k][1])
        tie_term += (j - i) ** 3 - (j - i)
        i = j
    n_b = n - n_a
    u_a = r_a - n_a * (n_a + 1) / 2.0
    mu = n_a * n_b / 2.0
    sig2 = (n_a * n_b / 12.0
            * ((n + 1) - tie_term / (n * (n - 1.0))))
    z = (u_a - mu) / sig2 ** 0.5
    out = agg_mannwhitney_u(spark, sf_dir).collect()[0]
    assert out["n_a"] == n_a and out["n_b"] == n_b
    assert abs(out["u_a"] - u_a) < 1e-6
    assert abs(out["z_score"] - z) < 1e-3
    # identity: U_A + U_B = n_a * n_b (midranks partition the rank mass)
    u_b = n_a * n_b - u_a
    assert 0.0 <= u_a <= n_a * n_b and 0.0 <= u_b <= n_a * n_b


def test_shortest_paths_match_bellman_ford_replay(spark, sf_dir):
    """Distances must equal a driver-side Bellman–Ford (4 rounds) over
    the identical weighted edge list; seed distance is 0 and every
    distance is nonnegative."""
    from build_pipeline_with_apache_beam_spark.operators.graph import (
        _co_supply_pairs,
        graph_shortest_paths_weighted,
    )

    pairs = _co_supply_pairs(spark, sf_dir)
    rows = pairs.collect()
    cps = sorted(r["co_parts"] for r in rows)
    # numpy-style linear-interpolated p95 (matches percentile/QUANTILE_CONT)
    import numpy as np
    cut = float(np.percentile(cps, 95))
    edges = []
    for r in rows:
        if r["co_parts"] >= cut:
            w = max(1, round(10000.0 / r["co_parts"]))
            edges.append((r["u"], r["v"], w))
            edges.append((r["v"], r["u"], w))
    seed = min(e[0] for e in edges)
    dist = {seed: 0}
    for _ in range(4):
        new = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < new.get(d, 1 << 60):
                new[d] = dist[s] + w
        dist = new
    out = {r["supplier"]: r["dist"]
           for r in graph_shortest_paths_weighted(spark, sf_dir).collect()}
    assert out == dist
    assert out[seed] == 0
    assert all(v >= 0 for v in out.values())


def test_feature_hashing_accounting(spark, sf_dir):
    """Bucket accounting laws: buckets used ≤ min(4096, distinct tokens);
    distinct tokens equal a direct countDistinct per source; collision
    rate in [0, 1) and consistent with the used/distinct ratio."""
    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.text import (
        text_feature_hashing,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = {r["source"]: r["d"] for r in
             docs.select("source",
                         F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("source")
             .agg(F.countDistinct("tok").alias("d")).collect()}
    for r in text_feature_hashing(spark, sf_dir).collect():
        assert r["n_distinct_tokens"] == exact[r["source"]]
        assert r["n_buckets_used"] <= min(4096, r["n_distinct_tokens"])
        assert r["n_tokens"] >= r["n_distinct_tokens"]
        assert r["max_bucket_collisions"] >= 1
        assert 0.0 <= r["collision_rate"] < 1.0
        expect = 1.0 - r["n_buckets_used"] / r["n_distinct_tokens"]
        assert abs(r["collision_rate"] - expect) < 1e-3


def test_schema_drift_report_shape(spark, sf_dir):
    """The drift report must show the planted evolution exactly: the new
    generation adds o_orderpriority (absent → −1.0 sentinel on the old
    side), both generations otherwise null-free."""
    from build_pipeline_with_apache_beam_spark.operators.scans import (
        dq_schema_drift,
    )

    rows = {r["col_name"]: r for r in dq_schema_drift(spark, sf_dir).collect()}
    assert set(rows) == {"o_orderkey", "o_totalprice", "o_orderpriority"}
    pri = rows["o_orderpriority"]
    assert (not pri["in_old"]) and pri["in_new"]
    assert pri["null_frac_old"] == -1.0 and pri["null_frac_new"] == 0.0
    for c in ("o_orderkey", "o_totalprice"):
        r = rows[c]
        assert r["in_old"] and r["in_new"]
        assert r["null_frac_old"] == 0.0 and r["null_frac_new"] == 0.0


def test_ks_matches_python_replay(spark, sf_dir):
    """D must equal max |F_A − F_B| over the pooled support replayed in
    Python, and the p-value must follow the one-term asymptotic formula
    from the unrounded D."""
    import math

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        agg_ks_test,
    )

    rows = (load_table(spark, sf_dir, "events")
            .where(F.col("event_type") == "purchase")
            .select("user_id", "value").collect())
    a = sorted(r["value"] for r in rows
               if _bucket64k(str(r["user_id"])) < 32768)
    b = sorted(r["value"] for r in rows
               if _bucket64k(str(r["user_id"])) >= 32768)
    support = sorted(set(a) | set(b))
    import bisect
    d = max(abs(bisect.bisect_right(a, v) / len(a)
                - bisect.bisect_right(b, v) / len(b)) for v in support)
    en = len(a) * len(b) / (len(a) + len(b))
    p = min(1.0, 2 * math.exp(-2 * d * d * en))
    out = agg_ks_test(spark, sf_dir).collect()[0]
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["ks_d"] - d) < 5.1e-5      # output is rounded to 4dp
    assert abs(out["p_value"] - p) < 1e-3
    assert 0.0 <= out["ks_d"] <= 1.0 and 0.0 <= out["p_value"] <= 1.0


def test_chisq_matches_python_replay(spark, sf_dir):
    """Chi-square statistic must equal the contingency-table definition
    replayed in Python over (event_type × md5 arm)."""
    from collections import Counter

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        agg_chisq_independence,
    )

    rows = (load_table(spark, sf_dir, "events")
            .select("user_id", "event_type").collect())
    cells = Counter((r["event_type"],
                     "A" if _bucket64k(str(r["user_id"])) < 32768 else "B")
                    for r in rows)
    n = sum(cells.values())
    rt = Counter(); ct = Counter()
    for (et, arm), o in cells.items():
        rt[et] += o
        ct[arm] += o
    chi2 = sum((o - rt[et] * ct[arm] / n) ** 2 / (rt[et] * ct[arm] / n)
               for (et, arm), o in cells.items())
    out = agg_chisq_independence(spark, sf_dir).collect()[0]
    assert out["n"] == n
    assert out["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(out["chi2"] - chi2) < 1e-3
    assert out["chi2"] >= 0.0


def test_weighted_sample_rate_tracks_length(spark, sf_dir):
    """Inclusion probability is w/max_w, so across sources the realized
    rate must track mean(n_chars)/max(n_chars); the kept-char share must
    exceed the kept-doc rate (long docs are favored); and the decision
    must replay exactly in Python integer arithmetic."""
    import hashlib

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.corpus import (
        corpus_weighted_sample_exact,
    )

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source", "n_chars").collect())
    mx = max(r["n_chars"] for r in docs)
    kept = {}
    per_src: dict[str, list] = {}
    for r in docs:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12], 16)
        k = (h % 1000000) < (1000000 * r["n_chars"]) // mx
        per_src.setdefault(r["source"], []).append((r["n_chars"], k))
    for r in corpus_weighted_sample_exact(spark, sf_dir).collect():
        rows = per_src[r["source"]]
        n_kept = sum(1 for _, k in rows if k)
        assert r["n_docs"] == len(rows)
        assert r["n_kept"] == n_kept          # exact integer replay
        if 0 < n_kept < len(rows):
            assert r["kept_char_share"] >= n_kept / len(rows) - 0.05


def test_recursive_cte_stages_edge_collapse_outside_recursion(spark, sf_dir):
    """Round-12 regression pin (r11 verdict #7): the trade-edge collapse
    must be staged ONCE (round-13: as a collected ≤600-row local
    relation — no checkpoint blocks to leak) before the WITH RECURSIVE
    statement.  The inline-CTE form re-ran the 6-way join/agg inside the
    recursion machinery every step — 67 Spark jobs at HEAD-1; the staged
    form measures ~31.  The budget separates the two with slack for AQE
    job-splitting drift."""
    from build_pipeline_with_apache_beam_spark.operators.relational import (
        sql_recursive_cte,
    )

    sc = spark.sparkContext
    group = "rcte-job-budget"
    sc.setJobGroup(group, "staged recursive CTE")
    try:
        rows = sql_recursive_cte(spark, sf_dir).collect()
    finally:
        sc.setJobGroup("", "")
    # at sf0.001 the >=40-lineitem edge threshold prunes the trade graph
    # to (nearly) just the anchor — row count is oracle-checked elsewhere
    assert len(rows) >= 1
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert 0 < n_jobs <= 45, (
        f"recursive CTE spawned {n_jobs} jobs (budget 45; the unstaged "
        f"inline-CTE form measures ~67)")
