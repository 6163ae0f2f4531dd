"""Round-10 tests: the composed end-to-end curation pipeline gate
(VERDICT r9 item 3 — exact dedup → MinHash-capped near-dup → Gopher cut →
mixture sample → sequence packing as ONE job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.pipeline2 import (
    _E2E_WEIGHTS,
    q_pipeline_end_to_end,
    q_pipeline_funnel_report,
)


@pytest.fixture(scope="module")
def e2e_rows(spark, sf_dir):
    return q_pipeline_end_to_end(spark, sf_dir).collect()


def test_e2e_funnel_only_narrows(spark, sf_dir, e2e_rows):
    """Every stage consumes the previous stage's survivors: the final
    kept set must be a subset of the corpus, nonempty, and smaller than
    the corpus (each of dedup/quality/mixture cuts at this SF)."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(e2e_rows) < n_docs
    ids = [r["doc_id"] for r in e2e_rows]
    assert len(set(ids)) == len(ids)  # one span row per kept doc


def test_e2e_mixture_respects_weights(e2e_rows):
    """Only weighted sources survive the mixture stage, and BOTH
    saturation regimes appear (small sources keep everything at
    keep_frac 1; heavy sources get a real Bernoulli fraction) — the
    recipe was chosen so neither regime is vacuous at the test SF."""
    sources = {r["source"] for r in e2e_rows}
    assert sources <= set(_E2E_WEIGHTS)
    fracs = [r["keep_frac_r"] for r in e2e_rows]
    assert all(0 < f <= 1 for f in fracs)
    assert any(f == 1.0 for f in fracs)
    assert any(f < 1.0 for f in fracs)


def test_e2e_packing_is_contiguous(e2e_rows):
    """The packed spans must tile the token stream exactly: each doc's
    start position equals the previous docs' token total (the two-phase
    distributed prefix sum equals the naive global cumsum), and end_seq
    is derived from start + n_tokens."""
    cum = 0
    for r in sorted(e2e_rows, key=lambda r: r["doc_id"]):
        assert r["n_tokens"] > 0
        assert r["start_seq"] == cum // 512
        assert r["start_off"] == cum % 512
        cum += r["n_tokens"]
        assert r["end_seq"] == (cum - 1) // 512


def test_funnel_report_matches_spans(spark, sf_dir, e2e_rows):
    """The observability report must agree with the span gate it watches:
    stage-4 survivor count == span rows, stage-5 token volume == the
    spans' token sum, stage-5 n_units == last end_seq + 1, and the funnel
    is monotone non-increasing in both docs and tokens through stage 4."""
    rep = {r["stage"]: r for r in q_pipeline_funnel_report(spark, sf_dir).collect()}
    assert [rep[i]["label"] for i in range(1, 6)] == [
        "exact_dedup",
        "near_dup_components",
        "gopher_cut",
        "mixture_sample",
        "packed_sequences",
    ]
    for i in (2, 3, 4):
        assert rep[i]["n_units"] <= rep[i - 1]["n_units"]
        assert rep[i]["n_tokens"] <= rep[i - 1]["n_tokens"]
    assert rep[4]["n_units"] == len(e2e_rows)
    tok_total = sum(r["n_tokens"] for r in e2e_rows)
    assert rep[5]["n_tokens"] == tok_total == rep[4]["n_tokens"]
    assert rep[5]["n_units"] == max(r["end_seq"] for r in e2e_rows) + 1
    assert rep[5]["n_units"] == (tok_total - 1) // 512 + 1


def test_funnel_report_plans_single_pass(spark, sf_dir):
    """Guard the single-pass rewrite: the first draft (five aggregates
    over nested survivor frames) planned 30 parquet scans because AQE's
    exchange reuse does not fire across union branches; the
    membership-flags form plans 8. A regression past 12 means someone
    reintroduced per-stage re-derivation."""
    plan = (
        q_pipeline_funnel_report(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") <= 12


def test_fuzzy_length_shard_is_lossless(spark):
    """The r10 length-bucket block shard must lose NO in-band pair: for
    names whose lengths straddle every bucket boundary (width
    max_dist+1), the sharded blocking returns exactly the matches a
    brute-force Levenshtein-threshold join finds inside the token
    blocks. This is the property that made the shard safe to land
    without re-deriving the gate oracle."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        joins,
    )

    # names share the block token ("widget"); prefixes step through
    # lengths 7..26 so pairs sit on both sides of every len div 4 edge
    rows = [(i, "x" * (i % 20) + " widget") for i in range(40)]
    left = spark.createDataFrame(
        [r for r in rows if r[0] % 2 == 0], ["id", "name"]
    )
    right = spark.createDataFrame(
        [r for r in rows if r[0] % 2 == 1], ["id", "name"]
    )
    got = {
        (r["left_id"], r["right_id"], r["dist"])
        for r in joins.fuzzy_best_match(
            left, right, "id", "id", "name", max_dist=3
        ).collect()
    }
    # brute-force twin: all pairs, length band, levenshtein, best per left
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {}
    for (li, ln), (ri, rn) in itertools.product(
        [r for r in rows if r[0] % 2 == 0], [r for r in rows if r[0] % 2 == 1]
    ):
        d = lev(ln, rn)
        if d <= 3 and (li not in want or (d, ri) < (want[li][0], want[li][1])):
            want[li] = (d, ri)
    assert got == {(li, ri, d) for li, (d, ri) in want.items()}


def test_fuzzy_rejects_negative_max_dist(spark):
    """max_dist < 0 must raise up front: the length-bucket divisor is
    max_dist + 1, and div 0 would otherwise surface as a runtime
    ArithmeticException under Spark 4's ANSI mode."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        joins,
    )

    df = spark.createDataFrame([(1, "a b")], ["id", "name"])
    with pytest.raises(ValueError, match="max_dist"):
        joins.fuzzy_best_match(df, df, "id", "id", "name", max_dist=-1)


def test_e2e_no_python_udfs_in_plan(spark, sf_dir):
    """The whole composed DAG stays JVM-side — no BatchEvalPython /
    ArrowEvalPython / FlatMapGroupsInPandas nodes anywhere in the plan
    (the funnel is Catalyst expressions + joins + one window family)."""
    plan = (
        q_pipeline_end_to_end(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
