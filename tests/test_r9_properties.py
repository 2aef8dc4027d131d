"""Property tests (hypothesis) for the round-9 integer primitives: the
cross-engine parity discipline rests on these identities holding for ALL
inputs, not just the corpus values — so fuzz them against Python's exact
integer semantics."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# posmod floor-division: (a - ((a % b + b) % b)) // b == floor(a / b),
# the identity every floor-mean / theta quantization in the engine uses
# (Spark % is truncating like C; Python % is floored — the identity is
# written so BOTH agree)
def _trunc_mod(a: int, b: int) -> int:
    # C/Spark/DuckDB semantics: sign follows the dividend
    return a - int(a / b if a * b >= 0 else -(-a // b) if b > 0 else 0) * b


@given(st.integers(-10**18, 10**18), st.integers(1, 10**12))
@settings(max_examples=500, deadline=None)
def test_posmod_floor_div_identity(a, b):
    # emulate truncating % (Spark/DuckDB): math.fmod-style
    tm = a - (abs(a) // b) * b * (1 if a >= 0 else -1)
    pm = (tm + b) % b  # second % is on a non-negative value: same everywhere
    assert (a - pm) % b == 0
    assert (a - pm) // b == a // b  # floor division, exactly


@given(st.integers(1, 2**55 - 1))
@settings(max_examples=500, deadline=None)
def test_logbucket_bucket_contains_value(c):
    """bucket = 16e + (16c >> e) - 16 covers [lo, lo + 2^e/16) ∋ c, and
    lo ≤ c always (the within_bound guarantee's arithmetic core)."""
    e = c.bit_length() - 1
    bucket = 16 * e + (16 * c >> e) - 16
    s = bucket % 16
    lo = ((16 + s) << e) >> 4
    hi_excl = ((17 + s) << e) >> 4 if s < 15 else (2 << e)
    assert 0 <= s < 16
    assert lo <= c
    if e >= 4:  # full sub-bucket resolution
        assert 16 * (c - lo) < (1 << e)
    assert c < (2 << e)  # stays inside its octave


@given(st.integers(0, 2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_cm_hash_rows_in_range_and_deterministic(k):
    """The fuzz that CAUGHT the r9 overflow: a*k exceeded int64 beyond
    k ~ 8.4e9; the mod-p pre-reduction makes the whole BIGINT domain
    safe."""
    from hiss_cube_spark.operators.quality_checks import _CM_HASH, _CM_P

    for a, b in _CM_HASH:
        kr = k % _CM_P
        h = ((a * kr + b) % _CM_P) % 512
        assert 0 <= h < 512
        assert a * kr + b < 2**63  # no int64 overflow in-engine


@given(
    st.lists(st.integers(-10**6, 10**6), min_size=4, max_size=10),
    st.lists(st.integers(-10**6, 10**6), min_size=4, max_size=10),
    st.integers(1, 3),
)
@settings(max_examples=200, deadline=None)
def test_lb_keogh_lower_bounds_constrained_dtw(a, b, r):
    """LB_Keogh(a | env_r(b)) ≤ DTW_r(a, b) — the soundness of the
    prefilter, checked against a reference DP on random series."""
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    INF = float("inf")
    D = [[INF] * (n + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(max(1, i - r), min(n, i + r) + 1):
            c = abs(a[i - 1] - b[j - 1])
            D[i][j] = c + min(D[i - 1][j], D[i - 1][j - 1], D[i][j - 1])
    dtw = D[n][n]
    lb = 0
    for i in range(n):
        w = b[max(0, i - r): min(n, i + r + 1)]
        u, l = max(w), min(w)
        if a[i] > u:
            lb += a[i] - u
        elif a[i] < l:
            lb += l - a[i]
    assert lb <= dtw


@given(st.lists(st.integers(-10**6, 10**6), min_size=2, max_size=12),
       st.lists(st.integers(-10**6, 10**6), min_size=2, max_size=12))
@settings(max_examples=200, deadline=None)
def test_lb_kim_features_lower_bound_dtw(a, b):
    """|Δfirst|, |Δlast|, |Δmax|, |Δmin| each ≤ unconstrained DTW — the
    containment theorem behind dtw_banded_pairs."""
    n, m = len(a), len(b)
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            D[i][j] = c + min(D[i - 1][j], D[i - 1][j - 1], D[i][j - 1])
    dtw = D[n][m]
    for f in (abs(a[0] - b[0]), abs(a[-1] - b[-1]),
              abs(max(a) - max(b)), abs(min(a) - min(b))):
        assert f <= dtw
