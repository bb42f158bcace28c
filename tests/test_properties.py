"""Property-based tests (hypothesis) for the deterministic layers that
need no SparkSession: the portable hash, the threshold arithmetic, and
the estimator SQL formulas (exercised via DuckDB, which shares the SQL
text with the driver's oracle)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from approximatequeryengine_spark.functions.hashing import (
    HASH_SPACE,
    M31,
    MULT,
    MULT2,
    OFFSET,
    SALT_STRIDE,
    fraction_threshold,
)
from approximatequeryengine_spark.plans.estimators import moments_sql
from approximatequeryengine_spark.plans.sampling import SamplingSpec, sampling_p_sql, sampling_where_sql


def py_hash(k: int, salt: int = 0) -> int:
    """Reference implementation of the portable hash in plain Python."""
    t1 = (abs(k) + salt * SALT_STRIDE) % M31
    t2 = (t1 * MULT + OFFSET) % HASH_SPACE
    return ((t2 % M31) * MULT2 + 144) % HASH_SPACE


@given(st.integers(min_value=-(2**62), max_value=2**62), st.integers(0, 1000))
def test_hash_range(k, salt):
    assert 0 <= py_hash(k, salt) < HASH_SPACE


@given(
    st.integers(min_value=0, max_value=2**40),
    st.floats(min_value=1e-6, max_value=1.0),
    st.floats(min_value=1e-6, max_value=1.0),
)
def test_sample_nestedness(k, f1, f2):
    """Membership is monotone in the fraction — the property the
    adaptive escalation loop relies on."""
    lo, hi = sorted([f1, f2])
    in_lo = py_hash(k) < fraction_threshold(lo)
    in_hi = py_hash(k) < fraction_threshold(hi)
    assert not in_lo or in_hi  # in_lo ⇒ in_hi


@given(st.floats(min_value=1e-9, max_value=1.0))
def test_threshold_bounds(f):
    t = fraction_threshold(f)
    assert 0 <= t <= HASH_SPACE


@given(st.floats(max_value=0.0), st.floats(min_value=1.0000001, allow_infinity=True))
def test_threshold_rejects_bad_fractions(bad_lo, bad_hi):
    with pytest.raises(ValueError):
        fraction_threshold(bad_lo)
    with pytest.raises(ValueError):
        fraction_threshold(bad_hi)


@st.composite
def table_and_fraction(draw):
    values = draw(
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=3,
            max_size=60,
        )
    )
    fraction = draw(st.sampled_from([0.05, 0.1, 0.25, 0.5, 1.0]))
    return values, fraction


def _duck_with(values):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(values, 1)))
    return con


@settings(max_examples=25, deadline=None)
@given(table_and_fraction())
def test_estimator_formulas_via_oracle_sql(tf):
    """The oracle SQL (shared text with the driver gate) must satisfy:
    f=1 reproduces the exact sum with zero margin; any f gives
    ci_lower ≤ est ≤ ci_upper and realized-n consistency."""
    values, fraction = tf
    spec = SamplingSpec(design="uniform_hash", fraction=fraction, key="id")
    sql = moments_sql(
        table="t",
        column="x",
        where=sampling_where_sql(spec),
        agg="sum",
        p_sql=sampling_p_sql(spec),
        alias="est",
    )
    con = _duck_with(values)
    est, lo, hi, n = con.execute(sql).fetchone()
    in_sample = [v for k, v in enumerate(values, 1) if py_hash(k) < fraction_threshold(fraction)]
    assert n == len(in_sample)
    if n == 0:
        assert est is None
        return
    assert lo <= est <= hi
    if fraction == 1.0:
        assert est == pytest.approx(sum(values), rel=1e-12, abs=1e-9)
        assert hi - lo == pytest.approx(0.0, abs=1e-9)  # 1−p = 0 ⇒ HT margin 0
    else:
        assert est == pytest.approx(sum(in_sample) / fraction, rel=1e-9, abs=1e-6)


@settings(max_examples=25, deadline=None)
@given(table_and_fraction())
def test_avg_estimator_within_sample_range(tf):
    values, fraction = tf
    spec = SamplingSpec(design="uniform_hash", fraction=fraction, key="id")
    sql = moments_sql(
        table="t",
        column="x",
        where=sampling_where_sql(spec),
        agg="avg",
        p_sql=sampling_p_sql(spec),
        alias="est",
    )
    con = _duck_with(values)
    est, lo, hi, n = con.execute(sql).fetchone()
    in_sample = [v for k, v in enumerate(values, 1) if py_hash(k) < fraction_threshold(fraction)]
    if n == 0:
        return
    assert min(in_sample) - 1e-9 <= est <= max(in_sample) + 1e-9
    assert lo <= est <= hi


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.tuples(st.integers(10, 10_000), st.integers(0, 100_000)),
        min_size=2,
        max_size=4,
    ),
    st.sampled_from([0.01, 0.05, 0.2]),
)
def test_neyman_arithmetic(strata, total_fraction):
    """Pure-arithmetic core of neyman_allocation: fractions ∝ stddev,
    clamped to [min_f, 1], and expected sample size ≈ f·N when no
    clamping binds."""
    nh = {k: v[0] for k, v in strata.items()}
    sh = {k: v[1] for k, v in strata.items()}
    n_total = sum(nh.values())
    ns_sum = sum(nh[k] * sh[k] for k in nh)
    if ns_sum == 0:
        return
    fracs = {
        k: min(max(total_fraction * n_total * sh[k] / ns_sum, 0.005), 1.0) for k in nh
    }
    for f in fracs.values():
        assert 0.005 <= f <= 1.0
    unclamped = {
        k: total_fraction * n_total * sh[k] / ns_sum for k in nh
    }
    if all(0.005 <= u <= 1.0 for u in unclamped.values()):
        expected = sum(nh[k] * fracs[k] for k in nh)
        assert expected == pytest.approx(total_fraction * n_total, rel=1e-9)


@given(
    k=st.integers(min_value=0, max_value=2**62),
    salt=st.integers(min_value=-64, max_value=10_000),
)
@settings(max_examples=300, deadline=None)
def test_avalanche_hash_python_model_range_and_determinism(k, salt):
    """The python model of the avalanche hash (mirroring the Column and
    SQL builders) stays in [0, 2^32) with no 64-bit overflow anywhere,
    for every key/salt — including the bootstrap's negative replicate
    offsets folded into the salt."""
    from approximatequeryengine_spark.functions.hashing import (
        AVALANCHE_MULT,
        HASH_SPACE,
        SALT_STRIDE,
    )

    x = (abs(k) + salt * SALT_STRIDE) % HASH_SPACE
    assert 0 <= x < HASH_SPACE
    for _ in range(2):
        x ^= x >> 16
        prod = x * AVALANCHE_MULT
        assert prod < 2**63  # stays inside BIGINT on both engines
        x = prod % HASH_SPACE
    x ^= x >> 16
    assert 0 <= x < HASH_SPACE


@given(u=st.floats(min_value=0.0, max_value=1.0, exclude_max=True))
@settings(max_examples=300, deadline=None)
def test_poisson_ladder_is_monotone_inverse_cdf(u):
    """The Poisson(1) inverse-CDF ladder maps [0,1) onto 0..9,
    monotonically, with breakpoints exactly at the CDF values."""
    from approximatequeryengine_spark.plans.bootstrap import _POISSON_CDF

    def w_of(u):
        for k, c in enumerate(_POISSON_CDF):
            if u < c:
                return k
        return 9

    w = w_of(u)
    assert 0 <= w <= 9
    if w > 0:
        assert u >= _POISSON_CDF[w - 1]
    if w < 9:
        assert u < _POISSON_CDF[w]


# -- round-2 additions: avalanche family, BLB weights, histogram, CMS -------


AVALANCHE_MULT = 73_244_475


def py_avalanche(k: int, salt: int) -> int:
    h = (abs(k) + salt * SALT_STRIDE) % HASH_SPACE
    for _ in range(2):
        h = h ^ (h // 65536)
        h = (h * AVALANCHE_MULT) % HASH_SPACE
    return h ^ (h // 65536)


@given(st.integers(min_value=-(2**62), max_value=2**62), st.integers(0, 10_000))
def test_avalanche_range(k, salt):
    assert 0 <= py_avalanche(k, salt) < HASH_SPACE


@given(st.floats(min_value=1.0, max_value=60.0))
@settings(max_examples=25, deadline=None)
def test_poisson_cdf_table_is_valid(lam):
    """BLB/bootstrap weight ladder: strictly increasing CDF starting at
    e^-λ and reaching ~1 — for any λ the Poisson(1/f) construction may
    use."""
    import math

    from approximatequeryengine_spark.plans.bootstrap import _poisson_cdf_table

    t = _poisson_cdf_table(lam)
    assert t[0] == pytest.approx(math.exp(-lam), rel=1e-12)
    assert all(b > a for a, b in zip(t, t[1:]))
    assert t[-1] >= 1.0 - 1e-9


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=60
    ),
    st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=25, deadline=None)
def test_hist_quantile_sql_within_bin_width(values, q):
    """The histogram-quantile SQL (the driver's oracle text) is within
    one bin width of the ⌈q·n⌉-th order statistic for arbitrary data
    (the exact guarantee — it coincides with interpolated quantiles on
    dense data, but sparse data can place the interpolated quantile
    between distant points)."""
    import math

    from approximatequeryengine_spark.plans.histogram import hist_quantiles_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    est = con.execute(hist_quantiles_sql("t", "x", qs=(q,), bins=64)).fetchone()[1]
    n = len(values)
    order_stat = sorted(values)[max(0, math.ceil(q * n) - 1)]
    bin_w = (max(values) - min(values)) / 64
    # round_to=4 in the SQL adds ≤5e-5 on top of the bin-width bound
    assert abs(est - order_stat) <= bin_w + 1e-4


@given(
    st.lists(
        st.text(alphabet="abcdefg ", min_size=1, max_size=40), min_size=1, max_size=30
    )
)
@settings(max_examples=20, deadline=None)
def test_countmin_sql_never_undercounts(texts):
    """Count-Min one-sided guarantee holds for arbitrary corpora: every
    top-k estimate from the oracle SQL is >= the exact count."""
    from approximatequeryengine_spark.plans.countmin import countmin_topk_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    rows = con.execute(countmin_topk_sql(k=10, depth=2, width=16)).fetchall()
    for _token, exact_cnt, cms_est, _infl in rows:
        assert cms_est >= exact_cnt


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 2**40), min_size=1, max_size=60, unique=True),
    st.lists(st.integers(0, 2**40), min_size=1, max_size=60, unique=True),
)
def test_bloom_oracle_no_false_negatives_any_keys(members, probes):
    """The Bloom accounting SQL must hold its invariants for ARBITRARY
    key sets, not just the fixture: every true member passes (n_exact
    equals the true match count — no false negatives), passes never
    exceed the fact count, and false positives are non-negative."""
    from approximatequeryengine_spark.plans.bloom import bloom_prune_semi_join_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE dimt AS SELECT unnest(?::BIGINT[]) AS dk, 1 AS flag",
        [members],
    )
    con.execute(
        "CREATE TABLE factt AS SELECT unnest(?::BIGINT[]) AS fk, 1.0 AS m",
        [probes],
    )
    row = con.execute(
        bloom_prune_semi_join_sql("factt", "dimt", "fk", "dk", "m", "flag = 1")
    ).fetchone()
    n_fact, n_pass, n_exact, n_fp, fp_rate, _ = row
    true_matches = len(set(members) & set(probes))
    assert n_fact == len(probes)
    assert n_exact == true_matches  # no false negatives, ever
    assert 0 <= n_fp == n_pass - n_exact
    assert n_pass <= n_fact


@given(
    offset=st.floats(min_value=-1e7, max_value=1e7),
    spread=st.floats(min_value=0.1, max_value=100.0),
    n=st.integers(min_value=10, max_value=400),
)
@settings(max_examples=200, deadline=None)
def test_m4_recentering_identity_python_model(offset, spread, n):
    """The grouped-stddev fix rests on the binomial recentering
    identity m4c = m4 - 4*d1*m3 + 6*d1^2*m2 - 3*d1^4 computed about an
    integer center within 0.5 of the group mean. Property: for ANY
    group mean offset, the recentered fourth moment from a NEARBY
    center equals the directly-computed central moment to float
    precision — i.e. the bounded-|d1| precondition makes the identity
    numerically exact, which the old unbounded-global-center algebra
    was not."""
    import math

    xs = [offset + spread * ((i * 2654435761 % 97) / 97.0 - 0.5) for i in range(n)]
    mean = sum(xs) / n
    c = float(math.floor(mean + 0.5))
    d1 = sum(x - c for x in xs) / n
    assert abs(d1) <= 0.5 + 1e-9
    m2 = sum((x - c) ** 2 for x in xs) / n
    m3 = sum((x - c) ** 3 for x in xs) / n
    m4 = sum((x - c) ** 4 for x in xs) / n
    m4c = m4 - 4 * d1 * m3 + 6 * d1 * d1 * m2 - 3 * d1 ** 4
    direct = sum((x - mean) ** 4 for x in xs) / n
    scale = max(direct, 1e-12)
    assert m4c == pytest.approx(direct, rel=1e-6, abs=1e-9 * scale)


@given(
    giant=st.floats(min_value=1e4, max_value=1e8),
    body=st.floats(min_value=1.0, max_value=100.0),
    b=st.integers(min_value=1, max_value=50),
    n_above=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_outlier_threshold_tie_semantics_python_model(giant, body, b, n_above):
    """The outlier stratum uses the B-th largest VALUE as threshold t
    with STRICT x > t membership: ties at t always fall to the sampled
    side TOGETHER, so stratum membership is a pure function of the
    value — never of sort order among ties. The model mirrors
    plans/outlier.py's threshold derivation (min of the top-B multiset)
    with a tie block that STRADDLES the B boundary plus ``n_above``
    strictly larger values — the non-degenerate split the strict
    inequality must handle."""
    huge = giant * 3.0
    xs = [huge] * n_above + [giant] * (b + 3) + [body] * 50
    top = sorted(xs, reverse=True)[:b]
    t = min(top)
    out = [x for x in xs if x > t]
    if n_above >= b:
        # the top-B is all `huge`: t = huge, nothing exceeds it
        assert t == huge and out == []
    else:
        # t lands inside the giant tie block → ALL of its copies drop to
        # the sampled side together, only the `huge` values are outliers
        assert t == giant
        assert len(out) == n_above and all(x == huge for x in out)
    # threshold membership never splits a tie group
    assert all(x != t for x in out)
    # exact-sum decomposition holds for any split point
    assert sum(out) + sum(x for x in xs if x <= t) == pytest.approx(
        sum(xs), rel=1e-12
    )


# -- round-5 fourth batch: Morton interleave + bloom probe arithmetic -------


def _py_morton(xq: int, yq: int) -> int:
    z = 0
    for i in range(16):
        z |= ((xq >> i) & 1) << (2 * i)
        z |= ((yq >> i) & 1) << (2 * i + 1)
    return z


def _py_deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for i in range(16):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(st.integers(0, 65535), st.integers(0, 65535))
@settings(max_examples=200, deadline=None)
def test_morton_sql_matches_bit_interleave_and_roundtrips(xq, yq):
    """The %-arithmetic Morton SQL equals the bit interleave (checked
    via DuckDB, which shares the text with the oracle) and the code is
    invertible — no two cells collide."""
    from approximatequeryengine_spark.sources.zorder import morton_sql

    con = duckdb.connect()
    # CASTs mirror the real oracle, whose xq/yq arrive as BIGINT
    # columns; bare int literals would fold as INT32 and overflow.
    z = con.execute(
        f"SELECT {morton_sql(f'CAST({xq} AS BIGINT)', f'CAST({yq} AS BIGINT)')}"
    ).fetchone()[0]
    assert z == _py_morton(xq, yq)
    assert _py_deinterleave(z) == (xq, yq)


@given(st.integers(0, 65534), st.integers(0, 65535))
@settings(max_examples=100, deadline=None)
def test_morton_grows_with_x_at_fixed_y(xq, yq):
    """At fixed y, the Morton code is strictly increasing in x (x's
    bits occupy fixed positions), so equal-count blocks over z give
    every block FINITE x/y spans — the property that makes the
    blockmap's per-dimension min/max bounds useful. (z is NOT monotone
    across both dims jointly, which is exactly why the blockmap stores
    per-dimension bounds instead of z ranges.)"""
    assert _py_morton(xq + 1, yq) > _py_morton(xq, yq)


@given(st.integers(-(2**62), 2**62), st.integers(8, 1 << 24))
@settings(max_examples=200, deadline=None)
def test_bloom_probe_masks_in_range(key, m_bits):
    """Every probe lands inside the filter: word < ceil(m/32) and the
    mask is a single bit below 2^32 (BIGINT-exact in both engines)."""
    from approximatequeryengine_spark.sources.blockbloom import probe_masks

    need = probe_masks(key, m_bits)
    assert 1 <= len(need) <= 3
    for w, m in need.items():
        assert 0 <= w <= (m_bits - 1) // 32
        assert 0 < m < 2**32
        # OR of distinct single bits: no bit above 32 per word
        assert m == (m & 0xFFFFFFFF)


@given(st.integers(-(2**62), 2**62))
@settings(max_examples=100, deadline=None)
def test_bloom_probe_masks_deterministic(key):
    from approximatequeryengine_spark.sources.blockbloom import probe_masks

    assert probe_masks(key, 4096) == probe_masks(key, 4096)


# ---------------------------------------------------------------------------
# Round-8: the APPROX-SQL rewriter never emits invalid SQL.
# ---------------------------------------------------------------------------

_REWRITE_TABLES = {"lineitem": "l_orderkey * 8 + l_linenumber"}
_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _duck_lineitem():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem AS SELECT "
        "range AS l_orderkey, 1 AS l_linenumber, "
        "CAST(range % 50 AS DOUBLE) AS l_quantity, "
        "CAST(range % 1000 AS DOUBLE) AS l_extendedprice, "
        "CAST((range % 10) / 100.0 AS DOUBLE) AS l_discount, "
        "chr(65 + CAST(range % 3 AS INT)) AS l_returnflag, "
        "chr(70 + CAST(range % 2 AS INT)) AS l_linestatus "
        "FROM range(200)"
    )
    return con


@st.composite
def approx_queries(draw):
    col = draw(st.sampled_from(_COLS))
    alias = draw(st.sampled_from(["est", "v", "total_9", "r"]))
    pct = draw(st.sampled_from(["5", "10", "25.0", "100"]))
    kind = draw(
        st.sampled_from(
            ["SUM", "AVG", "COUNT", "ratio", "MEDIAN", "PERCENTILE",
             "DISTINCT", "SUMDISTINCT"]
        )
    )
    if kind == "DISTINCT":
        item = f"APPROX(COUNT(DISTINCT {col})) AS {alias}"
    elif kind == "SUMDISTINCT":
        item = f"APPROX(SUM(DISTINCT {col})) AS {alias}"
    elif kind == "ratio":
        item = f"APPROX(SUM({col}) / SUM(l_quantity)) AS {alias}"
    elif kind == "MEDIAN":
        item = f"APPROX(MEDIAN({col})) AS {alias}"
    elif kind == "PERCENTILE":
        q = draw(st.sampled_from(["0.1", "0.5", "0.9", "0.99"]))
        item = f"APPROX(PERCENTILE({col}, {q})) AS {alias}"
    else:
        item = f"APPROX({kind}({col})) AS {alias}"
    group = draw(
        st.sampled_from(
            [None, "l_returnflag", "l_linestatus",
             "l_returnflag, l_linestatus"]
        )
    )
    sel = f"{group}, {item}" if group else item
    where = draw(st.sampled_from([None, "l_quantity > 5", "l_discount <= 0.05"]))
    marker = draw(
        st.sampled_from([None, "STRATIFY BY l_returnflag", "USING AUX(l_quantity)"])
    )
    having = draw(
        st.sampled_from(
            [None, "item", "alias", "plain_agg", "mixed"]
        )
    )
    order = draw(st.booleans()) and group is not None
    cte = draw(
        st.sampled_from(
            [
                None,
                "WITH ok AS (SELECT 1 AS one) ",
                "WITH s AS (SELECT * FROM lineitem TABLESAMPLE (5 PERCENT)) ",
                "WITH aqe_exact AS (SELECT 1 AS one) ",
                "WITH RECURSIVE r AS (SELECT 1) ",
            ]
        )
    )
    q = f"SELECT {sel} FROM lineitem TABLESAMPLE ({pct} PERCENT)"
    if cte:
        q = cte + q
    if where:
        q += f" WHERE {where}"
    if group:
        q += f" GROUP BY {group}"
    if marker:
        q += f" {marker}"
    if having == "item":  # re-state the marker in the predicate
        q += f" HAVING {item.rsplit(' AS ', 1)[0]} > 100"
    elif having == "alias":  # bare output-alias reference
        q += f" HAVING {alias} > 100"
    elif having == "plain_agg":  # non-APPROX aggregate → must reject
        q += " HAVING count(*) > 1"
    elif having == "mixed":
        q += f" HAVING {item.rsplit(' AS ', 1)[0]} > 100 AND {alias} < 1e12"
    if order:
        q += f" ORDER BY {group}"
    return q


@settings(max_examples=120, deadline=None)
@given(approx_queries())
def test_rewriter_never_emits_invalid_sql(q):
    """Grammar fuzz over the full marker surface: for every generated
    query the rewriter must return None (caller raises a guidance
    error), raise the documented stratum==group ValueError, or emit
    text that (a) carries no residual marker tokens and (b) EXECUTES on
    DuckDB — the portability oracle. It must never emit SQL that fails
    to parse."""
    from approximatequeryengine_spark.frontend.approx_sql import (
        rewrite_approx_sql,
    )

    try:
        out = rewrite_approx_sql(q, _REWRITE_TABLES, round_to=4)
    except ValueError as e:
        assert "STRATIFY BY column" in str(e)
        return
    if out is None:
        return
    up = out.upper()
    assert "APPROX" not in up.replace("TABLESAMPLE", "")
    assert "TABLESAMPLE" not in up
    assert "STRATIFY" not in up and "USING AUX" not in up
    assert "HAVING" not in up  # rewritten to a WHERE over the estimates
    con = _duck_lineitem()
    rows = con.execute(out).fetchall()  # must parse AND run
    assert rows is not None


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=50_000),
    st.integers(min_value=1, max_value=99),
)
def test_rank_arithmetic_matches_sql_decimal_typing(n, q_pct):
    """The Python rank selection (plans/quantiles.py::_ranks) must pick
    the SAME lo/point/hi ranks the SQL texts compute — both engines
    type a plain decimal literal like 0.07 as DECIMAL, so `0.07 * 100`
    is exactly 7 in SQL while float math gives 7.000000000000001 and
    ceils to 8 (a real divergence this test pinned)."""
    import math

    from approximatequeryengine_spark.plans.estimators import Z_95
    from approximatequeryengine_spark.plans.quantiles import _ranks

    q = q_pct / 100.0
    z = Z_95
    lo, point, hi = _ranks(n, q, z)
    con = duckdb.connect()
    half = f"{z!r} * sqrt({n} * {q!r} * (1.0 - {q!r}))"
    row = con.execute(
        f"SELECT least(greatest(CAST(floor({q!r} * {n} - {half}) AS BIGINT), 1), {n}),"
        f"       least(greatest(CAST(ceil({q!r} * {n}) AS BIGINT), 1), {n}),"
        f"       least(greatest(CAST(ceil({q!r} * {n} + {half}) AS BIGINT), 1), {n})"
    ).fetchone()
    assert (lo, point, hi) == row, (n, q, (lo, point, hi), row)


def test_rank_arithmetic_pinned_decimal_cases():
    """Pinned divergence cases: float 0.07*100 = 7.000000000000001
    (ceil 8) where DECIMAL gives exactly 7. The old float _ranks
    picked point=8 here — one rank off the SQL oracle."""
    from approximatequeryengine_spark.plans.estimators import Z_95
    from approximatequeryengine_spark.plans.quantiles import _ranks

    assert _ranks(100, 0.07, Z_95)[1] == 7
    assert _ranks(1000, 0.07, Z_95)[1] == 70
    assert _ranks(10, 0.7, Z_95)[1] == 7
