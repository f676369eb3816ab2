"""Round-4 scalar/function surface: max_of/min_of, bin_at, zip,
array_split, format_bytes/format_timespan, datetime_part, parse_version,
parse_path, the element-wise series_* family, and the vector helpers
(series_dot_product/magnitude/cosine_similarity/pearson_correlation).
All Catalyst-native; each has a text twin in the SQL backend verified by
the equivalence parametrization at the bottom."""

from __future__ import annotations

import math

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, "Hello World", [1.0, 2.0, 3.0], [4.0, 5.0, 6.0],
             "2024-03-15 13:45:30", 2048.0, "1.2.3",
             "/usr/local/bin/app.tar.gz"),
            (2, None, [], [1.0], "2023-01-02 03:04:05", 0.0, "10.20",
             "C:\\Users\\x\\f.txt"),
            (3, "abc", None, None, "2024-06-09 06:00:00", 123456789.0,
             "bad", "rel/dir/file"),
        ],
        "id long, s string, a array<double>, b array<double>,"
        " ts_str string, sz double, ver string, path string",
    ).selectExpr("*", "CAST(ts_str AS TIMESTAMP) ts")
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def _one(engine, expr):
    return engine.query(f"T | where id == 1 | project x = {expr}").head().x


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_max_min_of(engine):
    assert _one(engine, "max_of(1, 5, 3)") == 5
    assert _one(engine, "min_of(id, 0)") == 0
    # nulls are skipped, not propagated
    assert _one(engine, "max_of(toint(null), 2)") == 2
    with pytest.raises(QueryError):
        engine.query("T | project x = max_of(1)")


def test_bin_at(engine):
    assert _one(engine, "bin_at(23, 10, 5)") == 15
    assert _one(engine, "bin_at(-3, 10, 5)") == -5
    assert str(
        _one(engine, "bin_at(ts, 1h, datetime(2024-01-01 00:30:00))")
    ) == "2024-03-15 13:30:00"


def test_zip(engine):
    assert _one(engine, "zip(a, b)") == [
        [1.0, 4.0], [2.0, 5.0], [3.0, 6.0]
    ]
    # zip-to-longest pads with nulls
    assert _one(engine, "zip(a, pack_array(9.0))") == [
        [1.0, 9.0], [2.0, None], [3.0, None]
    ]
    # variadic
    assert _one(engine, "zip(a, b, a)")[0] == [1.0, 4.0, 1.0]


def test_array_split(engine):
    assert _one(engine, "array_split(a, 1)") == [[1.0], [2.0, 3.0]]
    assert _one(engine, "array_split(a, pack_array(-1))") == [
        [1.0, 2.0], [3.0]
    ]
    assert _one(engine, "array_split(a, pack_array(1, 2))") == [
        [1.0], [2.0], [3.0]
    ]
    # out-of-range indices clamp
    assert _one(engine, "array_split(a, 99)") == [[1.0, 2.0, 3.0], []]


def test_inf_ascii_translate(engine):
    assert _one(engine, "isinf(todouble(1) / todouble(0))") is False
    # PQL / is try_divide (NULL on zero) — build inf via exp
    assert _one(engine, "isinf(exp(1000.0))") is True
    assert _one(engine, "isinf(toint(null))") is False
    assert _one(engine, "isascii(s)") is True
    assert _one(engine, 'isascii(strcat(s, "é"))') is False
    assert _one(engine, 'translate("lo", "01", s)') == "He001 W1r0d"


def test_hashes_and_encoding(engine):
    assert _one(engine, 'hash_sha256("x")') == (
        "2d711642b726b04401627ca9fbac32f5c8530fb1903cc4db02258717921a4881"
    )
    assert _one(engine, 'hash_sha1("x")') == (
        "11f6ad8ec52a2984abaafd7c3b516503785c2072"
    )
    assert _one(engine, 'hash_md5("x")') == (
        "9dd4e461268c8034f5c8564e155c67a6"
    )
    assert _one(engine, 'url_encode_component("a b+c")') == "a%20b%2Bc"


def test_datetime_part_and_endofweek(engine):
    assert _one(engine, 'datetime_part("year", ts)') == 2024
    assert _one(engine, 'datetime_part("quarter", ts)') == 1
    assert _one(engine, 'datetime_part("month", ts)') == 3
    assert _one(engine, 'datetime_part("day", ts)') == 15
    assert _one(engine, 'datetime_part("hour", ts)') == 13
    assert _one(engine, 'datetime_part("minute", ts)') == 45
    assert _one(engine, 'datetime_part("second", ts)') == 30
    assert _one(
        engine,
        'datetime_part("millisecond",'
        ' todatetime("2024-01-01 00:00:00.123456"))',
    ) == 123
    assert _one(
        engine,
        'datetime_part("microsecond",'
        ' todatetime("2024-01-01 00:00:00.123456"))',
    ) == 123456
    with pytest.raises(QueryError):
        engine.query('T | project x = datetime_part("eon", ts)')
    # 2024-03-15 is a Friday; week ends Saturday 23:59:59.999999
    assert str(_one(engine, "endofweek(ts)")) == (
        "2024-03-16 23:59:59.999999"
    )


def test_format_bytes(engine):
    assert _one(engine, "format_bytes(sz)") == "2 KB"
    assert _one(engine, "format_bytes(4096, 2)") == "4.0 KB"
    assert _one(engine, 'format_bytes(1073741824, 1, "MB")') == (
        "1024.0 MB"
    )
    assert _one(engine, "format_bytes(100)") == "100 Bytes"
    with pytest.raises(QueryError):
        engine.query('T | project x = format_bytes(1, 0, "XB")')


def test_format_timespan(engine):
    assert _one(
        engine,
        'format_timespan(totimespan("1.02:03:04.5678"), "d.hh:mm:ss.fff")',
    ) == "1.02:03:04.567"
    assert _one(
        engine, 'format_timespan(totimespan("0.01:02:03"), "h:m:s")'
    ) == "1:2:3"


def test_parse_version(engine):
    assert _one(engine, "parse_version(ver)") == (
        "00000001.00000002.00000003.00000000"
    )
    assert _one(engine, 'parse_version("10.20")') == (
        "00000010.00000020.00000000.00000000"
    )
    assert _one(engine, 'parse_version("x.1")') is None
    assert _one(engine, 'parse_version("1.2.3.4.5")') is None
    # canonical form is lexicographically comparable
    assert _one(
        engine,
        'parse_version("2.0") > parse_version("1.99.99")',
    ) is True


def test_parse_path(engine):
    r = _one(engine, "parse_path(path)")
    assert r.RootPath == "/"
    assert r.DirectoryPath == "/usr/local/bin"
    assert r.DirectoryName == "bin"
    assert r.Filename == "app.tar.gz"
    assert r.Extension == "gz"
    w = engine.query(
        "T | where id == 2 | project x = parse_path(path)"
    ).head().x
    assert w.RootPath == "C:/"
    assert w.Filename == "f.txt"


def test_series_elementwise(engine):
    assert _one(engine, "series_add(a, b)") == [5.0, 7.0, 9.0]
    assert _one(engine, "series_subtract(b, a)") == [3.0, 3.0, 3.0]
    assert _one(engine, "series_multiply(a, b)") == [4.0, 10.0, 18.0]
    assert _one(engine, "series_divide(b, a)") == [4.0, 2.5, 2.0]
    # divide by zero → null element (try_divide)
    assert _one(
        engine, "series_divide(a, pack_array(0.0, 1.0, 0.0))"
    ) == [None, 2.0, None]
    assert _one(engine, "series_pow(a, pack_array(2.0, 2.0, 2.0))") == [
        1.0, 4.0, 9.0
    ]
    assert _one(engine, "series_greater(b, pack_array(10.0, 2.0, 3.0))") \
        == [False, True, True]
    assert _one(engine, "series_abs(pack_array(-1.5, 2.0))") == [1.5, 2.0]
    assert _one(engine, "series_sign(pack_array(-3.0, 0.0, 9.0))") == [
        -1.0, 0.0, 1.0
    ]
    assert _one(engine, "series_sqrt(pack_array(4.0, 9.0))") == [2.0, 3.0]
    assert _one(engine, "series_floor(pack_array(1.7, -1.2))") == [1, -2]
    assert _one(engine, "series_ceiling(pack_array(1.2, -1.7))") == [2, -1]
    e = _one(engine, "series_exp(pack_array(0.0, 1.0))")
    assert e[0] == 1.0 and abs(e[1] - math.e) < 1e-12
    ln = _one(engine, "series_log(pack_array(1.0))")
    assert ln == [0.0]


def test_series_vector_helpers(engine):
    assert _one(engine, "series_dot_product(a, b)") == 32.0
    assert abs(_one(engine, "series_magnitude(a)") - math.sqrt(14)) < 1e-12
    cos = _one(engine, "series_cosine_similarity(a, b)")
    assert abs(cos - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12
    # perfectly linear → correlation 1
    assert abs(_one(engine, "series_pearson_correlation(a, b)") - 1.0) \
        < 1e-12
    # zero-variance side → null
    assert _one(
        engine,
        "series_pearson_correlation(a, pack_array(2.0, 2.0, 2.0))",
    ) is None
    # zero vector → null cosine
    assert _one(
        engine,
        "series_cosine_similarity(a, pack_array(0.0, 0.0, 0.0))",
    ) is None


def test_countof_regex_and_indexof_regex(engine):
    assert _one(engine, 'countof(s, "l+", "regex")') == 2
    assert _one(engine, 'countof(s, "l", "normal")') == 3
    assert _one(engine, 'indexof_regex(s, "o W")') == 4
    assert _one(engine, 'indexof_regex(s, "zzz")') == -1
    with pytest.raises(QueryError):
        engine.query('T | project x = countof(s, "l", "fuzzy")')


def test_simple_renames(engine):
    assert _one(engine, "week_of_year(ts)") == 11
    assert _one(engine, "repeat(7, 3)") == [7, 7, 7]
    assert _one(engine, 'string_size("aé")') == 3  # UTF-8 bytes
    assert _one(engine, "gettype(id)") == "bigint"
    assert len(_one(engine, "new_guid()")) == 36
    r = _one(engine, "rand()")
    assert 0.0 <= r < 1.0
    assert 0 <= _one(engine, "rand(10)") <= 9
    assert _one(engine, "range(1, 7, 2)") == [1, 3, 5, 7]
    assert _one(engine, "todecimal(ver)") is None  # "1.2.3" not numeric


_EQUIV_QUERIES = [
    "T | project id, x = max_of(id, 2, 1), y = min_of(id, 2)",
    "T | project id, x = bin_at(sz, 100, 5)",
    "T | project id, x = bin_at(ts, 1h, datetime(2024-01-01 00:30:00))",
    "T | project id, x = zip(a, b)",
    "T | project id, x = array_split(a, 1),"
    " y = array_split(a, pack_array(-2, 2))",
    "T | project id, x = isinf(sz), y = isascii(s)",
    'T | project id, x = translate("lo", "01", s), y = hash_sha256(s)',
    "T | project id, x = todecimal(ver), y = endofweek(ts)",
    'T | project id, x = datetime_part("quarter", ts),'
    ' y = datetime_part("millisecond", ts)',
    "T | project id, x = format_bytes(sz), y = format_bytes(sz, 2)",
    'T | project id, x = format_timespan(totimespan("1.02:03:04.5"),'
    ' "d.hh:mm:ss.fff")',
    "T | project id, x = parse_version(ver)",
    "T | project id, x = parse_path(path)",
    "T | project id, x = series_add(a, b), y = series_divide(a, b)",
    "T | project id, x = series_greater(a, b), y = series_abs(a)",
    "T | project id, x = series_dot_product(a, b),"
    " y = series_magnitude(a)",
    "T | project id, x = series_cosine_similarity(a, b),"
    " y = series_pearson_correlation(a, b)",
    'T | project id, x = countof(s, "l+", "regex"),'
    ' y = indexof_regex(s, "o W")',
    "T | project id, x = week_of_year(ts), y = repeat(id, 3)",
    "T | project id, x = string_size(s), y = gettype(a)",
    'T | project id, x = url_encode_component("a b+c")',
]


@pytest.mark.parametrize("q", _EQUIV_QUERIES)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    df_rows = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == df_rows, sql


# ------------------------- series_fir / seasonal / periods_detect


def test_series_fir(engine):
    r = _one(
        engine,
        "series_fir(pack_array(1.0,2.0,3.0,4.0,5.0), pack_array(1,1,1))",
    )
    assert r == [1.0, 1.5, 2.0, 3.0, 4.0]  # trailing MA, partial edges
    r = _one(
        engine,
        "series_fir(pack_array(1.0,2.0,3.0), pack_array(2,0), false)",
    )
    assert r == [0.0, 2.0, 4.0]  # unnormalized, f[last] hits newest
    r = _one(
        engine,
        "series_fir(pack_array(1.0,2.0,3.0,4.0,5.0),"
        " pack_array(1,1,1), true, true)",
    )
    assert r == [1.5, 2.0, 3.0, 4.0, 4.5]  # centered


def test_series_seasonal(engine):
    r = _one(
        engine, "series_seasonal(pack_array(1.0,2.0,3.0,1.0,2.0,3.0), 3)"
    )
    assert r == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]
    r = _one(engine, "series_seasonal(pack_array(1.0,2.0,3.0,5.0), 3)")
    assert r == [3.0, 2.0, 3.0, 3.0]  # phase 0 mean = (1+5)/2


def test_series_periods_detect(engine):
    import numpy as np

    sig = ",".join(
        str(float(v))
        for v in (np.sin(2 * np.pi * np.arange(24) / 6) + 2)
    )
    r = _one(
        engine, f"series_periods_detect(pack_array({sig}), 2, 10, 2)"
    )
    assert r.periods[0] == 6  # true period wins
    assert r.scores[0] > r.scores[1]
    with pytest.raises(QueryError):
        engine.query(
            "T | project x = series_periods_detect(a, 5, 2, 1)"
        )


_EQUIV_QUERIES_SERIES2 = [
    "T | project id, x = series_fir(a, pack_array(1,2,1))",
    "T | project id, x = series_fir(a, pack_array(1,1), false)",
    "T | project id, x = series_fir(a, pack_array(1,1,1), true, true)",
    "T | project id, x = series_seasonal(a, 2)",
    "T | project id, x = series_periods_detect(a, 1, 2, 1)",
]


@pytest.mark.parametrize("q", _EQUIV_QUERIES_SERIES2)
def test_sql_backend_equivalence_series2(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    df_rows = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == df_rows, sql


def test_column_ifexists(engine):
    assert _one(engine, 'column_ifexists(s, "none")') == "Hello World"
    assert _one(engine, 'column_ifexists(ghost, "none")') == "none"
    assert _one(engine, 'column_ifexists("id", 0)') == 1
    with pytest.raises(QueryError):
        engine.query("T | project x = column_ifexists(1 + 2, 0)")


def test_column_ifexists_sql(spark, tables, engine):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    q = ('T | project a = column_ifexists(s, "none"),'
         ' b = column_ifexists(ghost, "none")')
    a = _rows(engine.query(q))
    assert _rows(
        spark.sql(compile_to_sql(q, lambda n: tables[n].columns))
    ) == a


def test_approx_topk_passthrough(engine):
    # Spark 4 approx_top_k flows through the passthrough registry —
    # the mergeable frequent-items sketch
    out = engine.query(
        "T | summarize tk = approx_top_k(s, 2)"
    ).head().tk
    assert {e.item for e in out} <= {"Hello World", "abc"}
    # e["count"]: Row attribute access collides with tuple.count
    assert all(e["count"] == 1 for e in out)


def test_consume_pack_toguid(engine, spark, tables):
    out = engine.query("T | where id > 0 | consume")
    assert out.count() == 0 and out.columns[:2] == ["id", "s"]
    g = "6F9619FF-8B86-D011-B42D-00C04FC964FF"
    assert _one(engine, f'toguid("{g}")') == g.lower()
    assert _one(engine, 'toguid("not-a-guid")') is None
    assert _one(engine, 'pack("k", id)') == {"k": "1"} or \
        _one(engine, 'pack("k", id)') == {"k": 1}
    # SQL twins
    q = 'T | project a = toguid("' + g + '"), b = toguid(s)'
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    a = _rows(engine.query(q))
    assert _rows(
        spark.sql(compile_to_sql(q, lambda n: tables[n].columns))
    ) == a


def test_binary_all_aggregates(spark, tables, engine):
    from pql_spark import compile_to_sql

    out = engine.query(
        "T | summarize a = binary_all_and(id), o = binary_all_or(id),"
        " x = binary_all_xor(id)"
    ).head()
    assert (out.a, out.o, out.x) == (1 & 2 & 3, 1 | 2 | 3, 1 ^ 2 ^ 3)
    assert (
        engine.query("T | project n = bitset_count_ones(7)").head().n == 3
    )
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    q = ("T | summarize a = binary_all_and(id), o = binary_all_or(id),"
         " x = binary_all_xor(id)")
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))


def test_count_distinct_take_anyif(spark, tables, engine):
    from pql_spark import compile_to_sql

    q = ("T | summarize d = count_distinct(id),"
         " di = count_distinctif(id, id > 1),"
         " t = take_anyif(id, id == 2)")
    out = engine.query(q).head()
    assert (out.d, out.di, out.t) == (3, 2, 2)
    # no qualifying row -> NULL, not an arbitrary value
    assert engine.query(
        "T | summarize t = take_anyif(id, id > 99)"
    ).head().t is None
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))


def test_has_ipv4_family(spark, tables, engine):
    from pql_spark import QueryError, compile_to_sql

    def one(expr):
        return engine.query(
            f"T | where id == 1 | project x = {expr}"
        ).head().x

    txt = '"src=10.1.2.3 dst=192.168.0.300 peer=8.8.8.8."'
    assert one(f'has_ipv4({txt}, "10.1.2.3")') is True
    assert one(f'has_ipv4({txt}, "10.1.2")') is False  # partial token
    # 192.168.0.300 has an out-of-range octet -> not a valid ip
    assert one(f'has_ipv4({txt}, "192.168.0.300")') is False
    # delimiter rule: embedded in a wider dotted token -> no match
    assert one('has_ipv4("x1.2.3.4.5y", "1.2.3.4")') is False
    assert one(f'has_any_ipv4({txt}, "1.1.1.1", "8.8.8.8")') is True
    assert one(f'has_ipv4_prefix({txt}, "10.1.")') is True
    assert one(f'has_ipv4_prefix({txt}, "10.2.")') is False
    with pytest.raises(QueryError):
        engine.query('T | project x = has_ipv4("a")')
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    q = ('T | project id, a = has_ipv4("ip 10.0.0.1 here", "10.0.0.1"),'
         ' b = has_any_ipv4("10.0.0.1 2.2.2.2", "9.9.9.9", "2.2.2.2"),'
         ' c = has_ipv4_prefix("from 172.16.4.2", "172.16.")')
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))


def test_jaccard_and_multi_array_sort(spark, tables, engine):
    from pql_spark import compile_to_sql

    def one(expr):
        return engine.query(
            f"T | where id == 1 | project x = {expr}"
        ).head().x

    assert one(
        "jaccard_index(pack_array(1, 2, 3), pack_array(2, 3, 4))"
    ) == pytest.approx(2 / 4)
    assert one(
        "jaccard_index(pack_array(1, 1, 2), pack_array(1, 2))"
    ) == 1.0  # distinct-element semantics
    # multi-array: later arrays reorder by the first's sort
    out = one(
        'array_sort_asc(pack_array(3, 1, 2), pack_array("c", "a", "b"))'
    )
    assert (list(out.a0), list(out.a1)) == ([1, 2, 3], ["a", "b", "c"])
    out = one(
        'array_sort_desc(pack_array(3, 1, 2), pack_array("c", "a", "b"))'
    )
    assert (list(out.a0), list(out.a1)) == ([3, 2, 1], ["c", "b", "a"])
    # nulls last in BOTH directions; stability preserves pair alignment
    out = one(
        "array_sort_asc(pack_array(toint(null), 2, 1),"
        ' pack_array("n", "b", "a"))'
    )
    assert (list(out.a0), list(out.a1)) == ([1, 2, None], ["a", "b", "n"])
    # shorter secondary arrays pad with null at gathered positions
    out = one(
        "array_sort_asc(pack_array(2, 1), pack_array(9))"
    )
    assert (list(out.a0), list(out.a1)) == ([1, 2], [None, 9])
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    q = ("T | project id,"
         " j = jaccard_index(a, b),"
         " s = array_sort_desc(a, b)")
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))


def test_format_ipv4_mask(spark, tables, engine):
    from pql_spark import compile_to_sql

    def one(expr):
        return engine.query(
            f"T | where id == 1 | project x = {expr}"
        ).head().x

    assert one('format_ipv4("192.165.12.17", 24)') == "192.165.12.0"
    assert one('format_ipv4("192.165.12.17")') == "192.165.12.17"
    assert one('format_ipv4_mask("192.165.12.17", 24)') == "192.165.12.0/24"
    assert one('format_ipv4_mask("10.1.2.3")') == "10.1.2.3/32"
    assert one('format_ipv4_mask("bad", 8)') is None
    assert one('format_ipv4("1.2.3.4", 99)') is None
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    q = ('T | project id, a = format_ipv4("172.16.5.9", 12),'
         ' b = format_ipv4_mask("172.16.5.9", 12)')
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == _rows(engine.query(q))
