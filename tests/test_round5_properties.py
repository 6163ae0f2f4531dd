"""Property-based tests (hypothesis) for round-5 algorithmic invariants.

These pin the ALGEBRA the Spark expressions implement, in pure-Python
mirrors of the exact formulas (the DataFrame implementations are pinned
to the same semantics by the DuckDB oracle gate + unit tests; these
properties cover the input space those point checks cannot):

- skyline: the windowed per-x-max formulation equals brute-force
  dominance for ANY input,
- equi-depth buckets: integer bucket assignment partitions every row,
  never splits ties, and is monotone in the value,
- BPE padded replace: merging never creates or destroys characters, and
  the merged pair count is bounded by the pair's occurrence count,
- Gini: bounded in [0, (n-1)/n], 0 exactly at equality.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


# --- skyline ------------------------------------------------------------

pts = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=40
)


def _skyline_windowed(rows):
    """Mirror of operators/stats.pareto_frontier: per-x max, running max
    over strictly-larger x, keep (x, ymax) pairs that beat it; rows
    survive iff (x, y) is a surviving pair."""
    dmax = {}
    for x, y in rows:
        dmax[x] = max(y, dmax.get(x, y))
    frontier = set()
    best_above = None
    for x in sorted(dmax, reverse=True):
        if best_above is None or dmax[x] > best_above:
            frontier.add((x, dmax[x]))
        best_above = dmax[x] if best_above is None else max(best_above, dmax[x])
    return [(x, y) for x, y in rows if (x, y) in frontier]


def _skyline_brute(rows):
    out = []
    for x, y in rows:
        dominated = any(
            (ox >= x and oy >= y) and (ox > x or oy > y) for ox, oy in rows
        )
        if not dominated:
            out.append((x, y))
    return out


@given(pts)
@settings(max_examples=200, deadline=None)
def test_prop_skyline_windowed_equals_bruteforce(rows):
    assert sorted(_skyline_windowed(rows)) == sorted(_skyline_brute(rows))


# --- equi-depth buckets -------------------------------------------------


def _equidepth(values, k):
    """Mirror of operators/stats.equidepth_histogram's assignment:
    bucket(v) = 1 + (rows_before_v * k) // n over distinct values."""
    n = len(values)
    from collections import Counter

    counts = Counter(values)
    cb = 0
    buckets = {}
    for v in sorted(counts):
        buckets[v] = 1 + (cb * k) // n
        cb += counts[v]
    return buckets


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=200),
       st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_prop_equidepth_partitions_and_monotone(values, k):
    b = _equidepth(values, k)
    # every distinct value assigned exactly one bucket in [1, k]
    assert all(1 <= bb <= k for bb in b.values())
    # monotone: larger values never get a smaller bucket
    sv = sorted(b)
    assert all(b[a] <= b[c] for a, c in zip(sv, sv[1:]))
    # depth bound: any bucket holds < n/k + (largest tie run) rows
    from collections import Counter

    counts = Counter(values)
    n = len(values)
    per_bucket = Counter()
    for v, c in counts.items():
        per_bucket[b[v]] += c
    max_tie = max(counts.values())
    assert all(sz <= n // k + max_tie for sz in per_bucket.values())


# --- BPE padded replace -------------------------------------------------

sym = st.sampled_from(["a", "b", "ab", "c"])


@given(st.lists(sym, min_size=1, max_size=12), st.tuples(sym, sym))
@settings(max_examples=200, deadline=None)
def test_prop_bpe_replace_preserves_characters(seq, pair):
    # Mirror of the operator's space-padded non-overlapping replace.
    a, b = pair
    s = " " + " ".join(seq) + " "
    merged = s.replace(f" {a} {b} ", f" {a}{b} ").strip()
    # characters are conserved (merging only removes separators)
    assert merged.replace(" ", "") == "".join(seq)
    # token count drops by exactly the number of merges performed
    n_merges = len(seq) - len(merged.split(" "))
    assert 0 <= n_merges <= sum(
        1 for i in range(len(seq) - 1) if (seq[i], seq[i + 1]) == (a, b)
    )


# --- Gini bounds --------------------------------------------------------


def _gini(vals):
    sv = sorted(vals)
    n = len(sv)
    tot = sum(sv)
    if tot == 0:
        return 0.0
    return 2.0 * sum((i + 1) * x for i, x in enumerate(sv)) / (n * tot) - (
        n + 1
    ) / n


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=100))
@settings(max_examples=200, deadline=None)
def test_prop_gini_bounded(vals):
    g = _gini(vals)
    n = len(vals)
    assert -1e-9 <= g <= (n - 1) / n + 1e-9
    if len(set(vals)) == 1 and vals[0] > 0:
        assert abs(g) < 1e-9  # perfect equality


def test_bridge_skyline_mirror_matches_spark(spark):
    """The pure-python mirror used by the property tests IS the Spark
    implementation's semantics: same survivors on a fixed adversarial
    input (duplicate points, same-x ties, same-y plateaus)."""
    import random

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st_ops

    rng = random.Random(99)
    rows = [(rng.randint(0, 8), rng.randint(0, 8)) for _ in range(60)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)], ["id", "x", "y"]
    )
    got = sorted(
        (r["x"], r["y"])
        for r in st_ops.pareto_frontier(df, "x", "y", ["x", "y"]).collect()
    )
    assert got == sorted(_skyline_windowed(rows)) == sorted(_skyline_brute(rows))
