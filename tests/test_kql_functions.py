"""EXTENSION KQL scalar/aggregate functions (SURVEY §2.6 beyond the
reference's 11 rewritten functions): string, conversion, datetime,
array, and aggregate families — DataFrame-backend semantics plus
DataFrame↔SQL-backend equivalence.  All Catalyst-native (no UDFs)."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, "Hello World", "2024-03-15 13:45:30", [3.0, 1.0, 2.0], 10.0),
            (2, "  pad  ", "2024-01-01 00:00:00", [5.0, 4.0], 20.0),
            (3, None, "2023-12-31 23:59:59", [], None),
            (4, "a,b,c,b", "2024-06-09 06:00:00", None, 40.0),
        ],
        "id long, s string, ts_str string, arr array<double>, v double",
    ).selectExpr(
        "id", "s", "ts_str", "CAST(ts_str AS TIMESTAMP) AS ts", "arr", "v"
    )
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _one(engine, expr):
    return engine.query(f"T | where id == 1 | project x = {expr}").head().x


def test_string_functions(engine):
    assert _one(engine, "strlen(s)") == 11
    assert _one(engine, "strrev(s)") == "dlroW olleH"
    assert _one(engine, 'substring(s, 6)') == "World"
    assert _one(engine, "substring(s, 0, 5)") == "Hello"
    assert _one(engine, 'split(s, " ")') == ["Hello", "World"]
    assert _one(engine, 'split(s, " ", 1)') == "World"
    assert _one(engine, 'indexof(s, "World")') == 6
    assert _one(engine, 'indexof(s, "zzz")') == -1
    assert _one(engine, 'countof(s, "l")') == 3
    assert _one(engine, 'replace_string(s, "World", "there")') == (
        "Hello there"
    )
    assert _one(engine, 'replace_regex(s, "[aeiou]", "_")') == "H_ll_ W_rld"
    assert _one(engine, r'extract("(\\w+)$", 1, s)') == "World"
    assert _one(engine, r'extract_all("(l+)", s)') == ["ll", "l"]
    assert _one(engine, 'trim("[Hd]", s)') == "ello Worl"
    assert _one(engine, 'trim_start("He", s)') == "llo World"
    assert _one(engine, 'trim_end("ld", s)') == "Hello Wor"
    assert _one(engine, 'strcat_delim("-", "a", "b", "c")') == "a-b-c"
    assert _one(engine, 'strcmp("a", "b")') == -1
    assert _one(engine, 'strcmp("b", "a")') == 1
    assert _one(engine, 'strcmp("a", "a")') == 0
    assert _one(engine, "tohex(255)") == "ff"
    assert _one(engine, 'base64_encode_tostring("hi")') == "aGk="
    assert _one(engine, 'base64_decode_tostring("aGk=")') == "hi"


def test_strcat_delim_null_keeps_slot(engine):
    # null → empty string but the delimiter stays (unlike raw concat_ws)
    out = engine.query(
        'T | where id == 3 | project x = strcat_delim("-", "a", s, "b")'
    )
    assert out.head().x == "a--b"


def test_empty_and_finite_predicates(engine):
    rows = engine.query(
        "T | project id, e = isempty(s), ne = isnotempty(s)"
    ).collect()
    by_id = {r.id: (r.e, r.ne) for r in rows}
    assert by_id[1] == (False, True)
    assert by_id[3] == (True, False)  # NULL is empty
    assert _one(engine, "isfinite(1.5)") is True
    assert _one(engine, "isfinite(1.0 / 0.0)") is False
    assert _one(engine, "isfinite(v - v)") is True


def test_conversions(engine):
    assert _one(engine, 'toint("42")') == 42
    assert _one(engine, 'toint("x")') is None  # unparseable ⇒ NULL
    assert _one(engine, 'tolong("9999999999")') == 9999999999
    assert _one(engine, 'todouble("2.5")') == 2.5
    assert _one(engine, 'tobool("true")') is True
    assert _one(engine, "tostring(42)") == "42"
    assert _one(engine, 'todatetime("2024-01-02 03:04:05")') == dt.datetime(
        2024, 1, 2, 3, 4, 5
    )


def test_tostring_null_is_empty(engine):
    out = engine.query("T | where id == 3 | project x = tostring(s)")
    assert out.head().x == ""


def test_case_function(engine):
    out = engine.query(
        "T | project id, c = case(v < 15, \"low\", v < 30, \"mid\","
        ' "high")'
    )
    by_id = {r.id: r.c for r in out.collect()}
    # id=3 has v NULL: both conditions null→FALSE ⇒ else branch
    assert by_id == {1: "low", 2: "mid", 3: "high", 4: "high"}


def test_case_arity_errors(engine):
    with pytest.raises(QueryError, match="odd number"):
        engine.query("T | project c = case(v < 15, 1)")


def test_datetime_functions(engine):
    assert _one(engine, "startofday(ts)") == dt.datetime(2024, 3, 15)
    assert _one(engine, "startofmonth(ts)") == dt.datetime(2024, 3, 1)
    assert _one(engine, "startofyear(ts)") == dt.datetime(2024, 1, 1)
    # 2024-03-15 is a Friday; week starts Sunday 2024-03-10 (KQL)
    assert _one(engine, "startofweek(ts)") == dt.datetime(2024, 3, 10)
    assert _one(engine, "endofday(ts)") == dt.datetime(
        2024, 3, 15, 23, 59, 59, 999999
    )
    assert _one(engine, "endofmonth(ts)") == dt.datetime(
        2024, 3, 31, 23, 59, 59, 999999
    )
    assert _one(engine, 'datetime_add("day", 10, ts)') == dt.datetime(
        2024, 3, 25, 13, 45, 30
    )
    assert (
        _one(engine, 'datetime_diff("hour", ts, startofday(ts))') == 13
    )
    assert _one(engine, "dayofweek(ts)") == 5  # Friday, 0=Sunday
    assert _one(engine, "getyear(ts)") == 2024
    assert _one(engine, "getmonth(ts)") == 3
    assert _one(engine, "hourofday(ts)") == 13
    assert _one(engine, 'format_datetime(ts, "yyyy/MM/dd")') == (
        "2024/03/15"
    )
    assert _one(engine, "unixtime_seconds_todatetime(86400)") == (
        dt.datetime(1970, 1, 2)
    )


def test_array_functions(engine):
    assert _one(engine, "array_length(arr)") == 3
    assert _one(engine, "array_sort_asc(arr)") == [1.0, 2.0, 3.0]
    assert _one(engine, "array_sort_desc(arr)") == [3.0, 2.0, 1.0]
    assert _one(engine, "array_index_of(arr, 1.0)") == 1
    assert _one(engine, "array_index_of(arr, 9.0)") == -1
    assert _one(engine, "array_slice(arr, 0, 1)") == [3.0, 1.0]
    assert _one(engine, "array_concat(arr, pack_array(9.0))") == [
        3.0, 1.0, 2.0, 9.0,
    ]
    assert _one(engine, "array_reverse(arr)") == [2.0, 1.0, 3.0]
    # NULL array ⇒ NULL length (KQL), not -1
    out = engine.query("T | where id == 4 | project x = array_length(arr)")
    assert out.head().x is None


def test_hash_function(engine):
    h1 = _one(engine, "hash(s)")
    assert isinstance(h1, int)
    assert _one(engine, "hash(s, 100)") == h1 % 100 if h1 >= 0 else True
    m = _one(engine, "hash(s, 100)")
    assert 0 <= m < 100


def test_aggregates(engine):
    row = engine.query(
        "T | summarize mx = arg_max(v, id), mn = arg_min(v, id),"
        " lst = make_list(v), st = make_set(s),"
        " lo = make_list_if(id, v >= 20), p = percentiles(v, 50, 100),"
        " sd = round(stdev(v), 4), av = take_any(v)"
    ).head()
    assert row.mx == 4 and row.mn == 1
    assert row.lst == [10.0, 20.0, 40.0]  # sorted, nulls dropped
    assert row.lo == [2, 4]
    assert row.p == [20.0, 40.0]
    assert row.sd == round(15.275252316519467, 4)
    assert row.av in (10.0, 20.0, 40.0)


def test_argc_errors(engine):
    # (renames like strlen() defer arity errors to Spark analysis, the
    # same engine-deferred policy the reference uses for passthroughs)
    for q, msg in [
        ("T | project x = substring(s)", "argument"),
        ('T | project x = datetime_add("eon", 1, ts)', "datetime part"),
        ("T | project x = percentiles(v)", "at least one"),
        ('T | project x = split(s, id)', "string literal"),
    ]:
        with pytest.raises(QueryError):
            engine.query(q)


EQUIV_QUERIES = [
    'T | project id, a = strlen(s), b = substring(s, 1, 4),'
    ' c = indexof(s, "l"), d = countof(s, "l")',
    'T | project id, a = split(s, " "), b = split(s, " ", 0)',
    'T | project id, a = replace_string(s, "l", "L"),'
    r' b = extract("(\\w+)", 1, s), c = extract_all("(l+)", s)',
    'T | project id, a = trim("[ ]", s), b = trim_start("[ ]", s),'
    ' c = trim_end("[ ]", s)',
    'T | project id, a = strcat_delim(",", s, "z", tostring(id))',
    'T | project id, a = strcmp(s, "Hello"), b = tohex(id),'
    " c = hash(s), d = hash(s, 7)",
    "T | project id, a = base64_encode_tostring(s),"
    " b = base64_decode_tostring(base64_encode_tostring(s))",
    "T | project id, a = isempty(s), b = isnotempty(s),"
    " c = isfinite(v), d = tostring(v)",
    "T | project id, a = toint(ts_str), b = todouble(v),"
    " c = todatetime(ts_str)",
    'T | project id, c = case(v < 15, "low", v < 30, "mid", "high")',
    "T | project id, a = startofday(ts), b = startofweek(ts),"
    " c = startofmonth(ts), d = startofyear(ts)",
    "T | project id, a = endofday(ts), b = endofmonth(ts),"
    " c = endofyear(ts)",
    'T | project id, a = datetime_add("hour", 3, ts),'
    ' b = datetime_diff("day", ts, startofyear(ts)), c = dayofweek(ts)',
    'T | project id, a = format_datetime(ts, "yyyy-MM-dd HH"),'
    " b = getyear(ts), c = getmonth(ts), d = hourofday(ts)",
    "T | project id, a = array_length(arr), b = array_sort_asc(arr),"
    " c = array_sort_desc(arr), d = array_index_of(arr, 2.0)",
    "T | project id, a = array_slice(arr, 0, 1),"
    " b = array_concat(arr, pack_array(7.0)), c = array_reverse(arr)",
    "T | summarize mx = arg_max(v, id), mn = arg_min(v, s),"
    " lst = make_list(v), st = make_set(v)",
    "T | summarize a = make_set_if(s, v > 10),"
    " b = make_list_if(id, isnotnull(s))",
    "T | summarize p = percentiles(v, 25, 50, 75), sd = stdev(v),"
    " sp = stdevp(v), vp = variancep(v) by b = id % 2",
]


@pytest.mark.parametrize("q", EQUIV_QUERIES)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    df_rows = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == df_rows, sql


# ---------------------------------------------------------------- extensions
# in-family word operators, between, and sketch aggregates (round 2)


def test_in_family_ops(engine):
    def ids(pred):
        return sorted(
            r.id for r in engine.query(f"T | where {pred} | project id")
            .collect()
        )

    assert ids("id between (2 .. 3)") == [2, 3]
    assert ids("id !between (2 .. 3)") == [1, 4]
    assert ids('s in~ ("HELLO WORLD", "A,B,C,B")') == [1, 4]
    assert ids("id !in (1, 2)") == [3, 4]
    assert ids('s !in~ ("HELLO WORLD")') == [2, 4]  # null s drops out
    assert ids('s has_any ("hello", "pad")') == [1, 2]
    assert ids('s has_all ("hello", "world")') == [1]
    assert ids('s has_all ("hello", "zzz")') == []


def test_dcount_accuracy_and_hll(engine):
    row = engine.query(
        "T | summarize a = dcount(id, 1), e = dcount_hll(hll(id))"
    ).head()
    # sparse-mode HLL is exact at tiny cardinalities
    assert row.a == 4 and row.e == 4
    merged = engine.query(
        "T | summarize s = hll(id) by b = id % 2"
        " | summarize t = dcount_hll(hll_merge(s))"
    ).head()
    assert merged.t == 4


def test_dcount_accuracy_validation(engine):
    with pytest.raises(QueryError):
        engine.query("T | summarize a = dcount(id, v)")  # non-literal


EXTRA_EQUIV = [
    "T | where id between (2 .. 3) | project id",
    "T | where id !between (2 .. 3) | project id",
    'T | where s in~ ("HELLO WORLD") | project id',
    "T | where id !in (1, 2) | project id",
    'T | where s has_any ("hello", "pad") | project id',
    'T | where s has_all ("hello", "world") | project id',
    "T | summarize a = dcount(id, 1)",
    "T | summarize e = dcount_hll(hll(id))",
]


@pytest.mark.parametrize("q", EXTRA_EQUIV)
def test_sql_backend_equivalence_extra(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    df_rows = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == df_rows, sql


def test_series_outliers(spark):
    from pql_spark import PqlEngine

    df = spark.createDataFrame(
        [(1, [1.0, 1.0, 1.0, 10.0]), (2, [5.0, 5.0]), (3, [])],
        "id long, arr array<double>",
    )
    eng = PqlEngine(spark, resolver={"S": df})
    out = {
        r.id: r.z
        for r in eng.query("S | extend z = series_outliers(arr)").collect()
    }
    assert [round(v, 4) for v in out[1]] == [-0.5774, -0.5774, -0.5774, 1.7321]
    assert out[2] == [0.0, 0.0]  # zero variance
    assert out[3] == []


# ------------------------------------------------- series_decompose


def test_series_decompose_matches_numpy(spark):
    import numpy as np

    from pql_spark import PqlEngine

    vals = [
        float(10 + 0.5 * i + [0, 2, 4, 1, -1, -3, -2][i % 7]
              + (30 if i == 20 else 0))
        for i in range(28)
    ]
    df = spark.createDataFrame([(1, vals)], "k long, s array<double>")
    eng = PqlEngine(spark, resolver={"T": df})
    out = eng.query(
        "T | extend d = series_decompose(s, 7) | project k, d"
    ).collect()[0].d
    a = np.array(vals)
    n, p = len(a), 7
    lo, hi = (p - 1) // 2, p // 2
    trend = np.array(
        [a[max(0, i - lo):min(i + hi, n - 1) + 1].mean() for i in range(n)]
    )
    det = a - trend
    ph = np.array([det[q::p].mean() for q in range(p)])
    sraw = np.array([ph[i % p] for i in range(n)])
    seasonal = sraw - sraw.mean()
    baseline = trend + seasonal
    assert np.allclose(np.array(out.trend), trend, atol=1e-9)
    assert np.allclose(np.array(out.seasonal), seasonal, atol=1e-9)
    assert np.allclose(np.array(out.baseline), baseline, atol=1e-9)
    assert np.allclose(np.array(out.residual), a - baseline, atol=1e-9)

    an = eng.query(
        "T | extend d = series_decompose_anomalies(s, 7, 2.5)"
        " | project k, d"
    ).collect()[0].d
    resid = a - baseline
    z = (resid - resid.mean()) / resid.std()
    assert [i for i, f in enumerate(an.ad_flag) if f] == [20]
    assert np.allclose(np.array(an.ad_score), z, atol=1e-9)


def test_series_decompose_backends_agree(spark):
    from pql_spark import PqlEngine

    vals = [float((i * 7919) % 13 + (i % 5)) for i in range(30)]
    df = spark.createDataFrame([(1, vals)], "k long, s array<double>")
    df.createOrReplaceTempView("SD_T")
    eng = PqlEngine(spark, resolver={"SD_T": df})
    for q in (
        "SD_T | extend d = series_decompose(s, 5)"
        " | mv-expand b = d.baseline, r = d.residual | project k, b, r",
        "SD_T | extend d = series_decompose_anomalies(s, 5)"
        " | mv-expand f = d.ad_flag, sc = d.ad_score | project k, f, sc",
    ):
        a = sorted(map(tuple, eng.query(q).collect()), key=repr)
        b = sorted(map(tuple, spark.sql(eng.to_sql(q)).collect()), key=repr)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            for u, v in zip(x, y):
                if isinstance(u, float):
                    assert abs(u - v) < 1e-9
                else:
                    assert u == v


def test_series_decompose_errors(spark):
    from pql_spark import PqlEngine, QueryError

    df = spark.createDataFrame([(1, [1.0, 2.0])], "k long, s array<double>")
    eng = PqlEngine(spark, resolver={"T": df})
    with pytest.raises(QueryError, match="integer literal"):
        eng.query("T | extend d = series_decompose(s, 1.5)")
    with pytest.raises(QueryError, match=">= 1"):
        eng.query("T | extend d = series_decompose(s, 0)")
    with pytest.raises(QueryError, match="number literal"):
        eng.query("T | extend d = series_decompose_anomalies(s, 2, k)")


def test_ipv4_family_and_matches_regex(spark):
    from pql_spark import PqlEngine

    df = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "172.16.5.1"), (3, "172.32.0.1"),
         (4, "192.168.1.77"), (5, "8.8.8.8"), (6, "999.1.1.1"),
         (7, None), (8, "not-an-ip")],
        "id long, ip string",
    )
    df.createOrReplaceTempView("IP_T")
    eng = PqlEngine(spark, resolver={"IP_T": df})
    q = (
        'IP_T | project id, pl = parse_ipv4(ip),'
        ' priv = ipv4_is_private(ip),'
        ' inr = ipv4_is_in_range(ip, "10.0.0.0/8"),'
        ' cmp = ipv4_compare(ip, "10.1.2.3"),'
        ' c24 = ipv4_compare(ip, "10.1.2.99", 24),'
        ' fmt = format_ipv4(ip),'
        ' mr = ip matches regex "^10\\\\.",'
        ' nc = ip !contains "16",'
        ' ej = extractjson("$.a", "{\\"a\\": 5}")'
        " | sort by id asc"
    )
    rows = [tuple(r) for r in eng.query(q).collect()]
    sql_rows = [tuple(r) for r in spark.sql(eng.to_sql(q)).collect()]
    assert rows == sql_rows
    r = {x[0]: x for x in rows}
    assert r[1][1] == 167838211 and r[1][2] is True and r[1][3] is True
    assert r[1][4] == 0 and r[1][5] == 0 and r[1][6] == "10.1.2.3"
    assert r[2][2] is True and r[3][2] is False and r[4][2] is True
    assert r[5][2] is False and r[5][4] == -1
    assert r[6][1] is None and r[6][6] is None  # malformed octet
    assert r[8][1] is None  # not numeric
    assert r[1][7] is True and r[5][7] is False
    assert r[2][8] is False and r[5][8] is True
    assert r[1][9] == "5"


def test_array_set_family(spark):
    from pql_spark import PqlEngine

    df = spark.createDataFrame([(1,)], "id long")
    df.createOrReplaceTempView("AS_T")
    eng = PqlEngine(spark, resolver={"AS_T": df})
    q = (
        "AS_T | project"
        " u = set_union(pack_array(1,2), pack_array(2,3), pack_array(4)),"
        " i = set_intersect(pack_array(1,2,3), pack_array(2,3,4)),"
        " d = set_difference(pack_array(1,2,3,4), pack_array(2),"
        " pack_array(4,5)),"
        " h = set_has_element(pack_array(1,2), 2),"
        " rl = array_rotate_left(pack_array(1,2,3,4,5), 2),"
        " rr = array_rotate_right(pack_array(1,2,3,4,5), 1),"
        " sl = array_shift_left(pack_array(1,2,3,4,5), 2),"
        " sr = array_shift_right(pack_array(1,2,3,4,5), 2, -1),"
        " ai = array_iff(pack_array(true, false, true),"
        " pack_array(1,2,3), pack_array(10,20,30))"
    )
    r = eng.query(q).collect()[0]
    assert r.u == [1, 2, 3, 4] and r.i == [2, 3] and r.d == [1, 3]
    assert r.h is True
    assert r.rl == [3, 4, 5, 1, 2] and r.rr == [5, 1, 2, 3, 4]
    assert r.sl == [3, 4, 5, None, None] and r.sr == [-1, -1, 1, 2, 3]
    assert r.ai == [1, 20, 3]
    a = [tuple(x) for x in eng.query(q).collect()]
    b = [tuple(x) for x in spark.sql(eng.to_sql(q)).collect()]
    assert a == b


def test_series_fit_2lines_numpy_reference(spark):
    import numpy as np

    from pql_spark import PqlEngine

    vals = [float(i + 0.1 * ((i * 7) % 3)) for i in range(10)] + [
        float(9 - 2 * i + 0.1 * ((i * 5) % 3)) for i in range(1, 9)
    ]
    df = spark.createDataFrame([(1, vals)], "k long, s array<double>")
    df.createOrReplaceTempView("F2_T")
    eng = PqlEngine(spark, resolver={"F2_T": df})
    d = eng.query(
        "F2_T | extend d = series_fit_2lines(s) | project k, d"
    ).collect()[0].d
    a = np.array(vals)
    n = len(a)

    def ssres(seg):
        x = np.arange(len(seg))
        sl, ic = np.polyfit(x, seg, 1)
        return ((seg - (ic + sl * x)) ** 2).sum()

    costs = [ssres(a[:k]) + ssres(a[k:]) for k in range(2, n - 1)]
    kbest = int(np.argmin(costs)) + 2
    sstot = ((a - a.mean()) ** 2).sum()
    assert d.split_idx == kbest
    assert abs(d.rsquare - (1 - min(costs) / sstot)) < 1e-9
    assert abs(d.variance - sstot / (n - 1)) < 1e-9
    assert abs(d.rvariance - min(costs) / (n - 1)) < 1e-9
    # too-short input → null struct
    short = eng.query(
        "F2_T | extend d = series_fit_2lines(pack_array(1.0, 2.0, 3.0))"
        " | project d"
    ).collect()[0].d
    assert short is None
    # backend equivalence
    q = (
        "F2_T | extend d = series_fit_2lines(s) | mv-expand lf = d.line_fit"
        " | project k, rsq = round(d.rsquare, 6), si = d.split_idx,"
        " lf = round(lf, 6)"
    )
    x = sorted(map(tuple, eng.query(q).collect()), key=repr)
    y = sorted(map(tuple, spark.sql(eng.to_sql(q)).collect()), key=repr)
    assert x == y


def test_bag_functions(spark):
    from pql_spark import PqlEngine, QueryError

    df = spark.createDataFrame([(1, "a", 2.5)], "id long, s string, v double")
    df.createOrReplaceTempView("BAG_T")
    eng = PqlEngine(spark, resolver={"BAG_T": df})
    qa = (
        'BAG_T | extend b = pack_all()'
        ' | project id, k = b["s"], n = array_length(bag_keys(b))'
    )
    r = eng.query(qa).collect()[0]
    assert (r.id, r.k, r.n) == (1, "a", 3)
    # r7: pack_all emits on the SQL backend too (map over _cur_cols)
    rs = spark.sql(eng.to_sql(qa)).collect()[0]
    assert (rs.id, rs.k, rs.n) == (1, "a", 3)
    q = (
        'BAG_T | project m = bag_merge(bag_pack("a", 1, "b", 2),'
        ' bag_pack("b", 99, "c", 3))'
    )
    got = dict(eng.query(q).collect()[0].m)
    assert got == {"a": 1, "b": 2, "c": 3}  # first bag wins on "b"
    assert dict(spark.sql(eng.to_sql(q)).collect()[0].m) == got
    with pytest.raises(QueryError, match="no arguments"):
        eng.query("BAG_T | extend b = pack_all(id)")


def test_geo_functions(spark):
    import math

    from pql_spark import PqlEngine

    df = spark.createDataFrame([(1,)], "id long")
    df.createOrReplaceTempView("GEO_T")
    eng = PqlEngine(spark, resolver={"GEO_T": df})
    q = (
        "GEO_T | project"
        " d = geo_distance_2points(-122.4194, 37.7749, -74.0060, 40.7128),"
        " inc = geo_point_in_circle(-122.41, 37.77, -122.4194, 37.7749,"
        " 2000.0),"
        " outc = geo_point_in_circle(-74.0, 40.7, -122.4194, 37.7749,"
        " 2000.0),"
        " bad = geo_distance_2points(999.0, 0.0, 0.0, 0.0)"
    )
    r = eng.query(q).collect()[0]
    lat1, lon1, lat2, lon2 = map(
        math.radians, (37.7749, -122.4194, 40.7128, -74.0060)
    )
    h = (
        math.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * math.cos(lat2)
        * math.sin((lon2 - lon1) / 2) ** 2
    )
    ref = 2 * 6371008.8 * math.asin(min(1, math.sqrt(h)))
    assert abs(r.d - ref) < 1e-6
    assert r.inc is True and r.outc is False and r.bad is None
    b = spark.sql(eng.to_sql(q)).collect()[0]
    assert abs(b.d - r.d) < 1e-6 and b.inc is True and b.bad is None
