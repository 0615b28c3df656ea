"""Full-recall edit-distance pairs (segment pigeonhole): output must
equal the brute-force pair set exactly — zero false negatives is the
contract, and the levenshtein verify removes all false positives."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from capital.operators.dedup import fuzzy_fullrecall_pairs, fuzzy_key_pairs


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _brute(rows, d):
    return sorted(
        (a[0], b[0], _lev(a[1], b[1]))
        for a, b in itertools.combinations(rows, 2)
        if _lev(a[1], b[1]) <= d
    )


def _engine(spark, rows, d):
    df = spark.createDataFrame(rows, "id long, k string")
    return sorted(
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_fullrecall_pairs(df, "k", "id", max_dist=d).collect()
    )


# Keys engineered around the construction's edge cases: substitutions,
# insertions, deletions at segment boundaries, empty and sub-segment-
# length strings, and long constant prefixes (the skew case).
_FIXED = [
    "ACME-001", "ACME-002", "ACME-0011", "ACM-001", "AACME-001",
    "ticker", "tickr", "tickerr", "ticket", "wicket",
    "ab", "b", "a", "", "abc", "abcd",
    "samsung", "samsong", "samsun", "xsamsung",
    "Customer#000000001", "Customer#000000002", "Customer#000000011",
]


def test_fullrecall_matches_brute_force_fixed(spark):
    rows = [(i, k) for i, k in enumerate(_FIXED)]
    for d in (1, 2):
        assert _engine(spark, rows, d) == _brute(rows, d)


_key = st.text(alphabet="abX-", min_size=0, max_size=9)


@given(keys=st.lists(_key, min_size=2, max_size=12, unique=True))
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fullrecall_matches_brute_force_random(spark, keys):
    """Tiny alphabet forces dense near-collisions; short lengths hit
    the degenerate short-key block constantly."""
    rows = [(i, k) for i, k in enumerate(keys)]
    assert _engine(spark, rows, 1) == _brute(rows, 1)


def test_fullrecall_superset_of_prefix_blocked(spark):
    """The prefix-blocked variant's documented recall gap: full recall
    must find every pair it finds, plus the prefix-divergent ones."""
    rows = [
        (0, "alpha-corp"), (1, "alpha-corp2"),      # suffix edit: both find
        (2, "Xlpha-corp"),                          # prefix edit: only full
        (3, "beta"), (4, "betaX"),
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    prefix = {
        (r.id_a, r.id_b)
        for r in fuzzy_key_pairs(df, "k", "id", prefix_len=5, max_dist=1).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in fuzzy_fullrecall_pairs(df, "k", "id", max_dist=1).collect()
    }
    assert prefix <= full
    assert (0, 2) in full and (0, 2) not in prefix
