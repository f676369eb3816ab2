"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (the
PQL language surface, compiled through pql_spark.PqlEngine) plus the
beyond-reference data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).  ``oracle_sql()`` carries the DuckDB
equivalent of each; the driver hash-compares both at sf=0.01.

Column-name parity rule: every computed column is aliased identically in
the Spark pipeline and the SQL string.  Double-typed aggregates are
rounded on both sides so value hashes are stable across engines.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pql_spark import PqlEngine
from pql_spark.operators import dedup as D
from pql_spark.operators import multimodal as M
from pql_spark.operators import similarity as S
from pql_spark.operators import text as X
from pql_spark.sources import parquet_catalog

# --------------------------------------------------------------------- PQL
# Each entry: (pql_text, oracle_sql).  The PQL runs through the full
# lexer→parser→DataFrame compiler; the oracle is hand-written ANSI SQL.

PQL_QUERIES: dict[str, tuple[str, str]] = {
    # TPC-H Q1-style pricing summary: where + summarize + sort
    "pql_q1_pricing": (
        """
        lineitem
        | where l_shipdate <= "1998-09-02"
        | summarize sum_qty = round(sum(l_quantity), 2),
                    sum_base = round(sum(l_extendedprice), 2),
                    avg_price = round(avg(l_extendedprice), 2),
                    n = count()
            by l_returnflag, l_linestatus
        | sort by l_returnflag asc, l_linestatus asc
        """,
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base,
               round(avg(l_extendedprice), 2) AS avg_price,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
    ),
    # where + project with computed column (arithmetic, comparison chain)
    "pql_where_project": (
        """
        lineitem
        | where l_quantity > 45 and l_discount >= 0.05
        | project l_orderkey, l_linenumber,
                  revenue = l_extendedprice * (1 - l_discount)
        """,
        """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        WHERE l_quantity > 45 AND l_discount >= 0.05
        """,
    ),
    # count operator — output column literally named count()
    "pql_count": (
        "lineitem | count",
        'SELECT count(*) AS "count()" FROM lineitem',
    ),
    # top N by (sort+limit fusion → TakeOrderedAndProject)
    "pql_top": (
        "orders | top 10 by o_totalprice",
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 10",
    ),
    # multi-key sort with explicit directions + take
    "pql_sort_take": (
        """
        customer
        | sort by c_acctbal desc, c_custkey asc
        | take 20
        """,
        """
        SELECT * FROM customer
        ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20
        """,
    ),
    # inner join + aggregation over the joined result
    "pql_join_inner": (
        """
        orders
        | where o_totalprice > 150000
        | join kind=inner (customer) on o_custkey == c_custkey
        | summarize n = count(), total = round(sum(o_totalprice), 2)
            by c_mktsegment
        """,
        """
        SELECT c_mktsegment, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 150000
        GROUP BY c_mktsegment
        """,
    ),
    # leftouter join with null backfill via coalesce passthrough
    "pql_join_leftouter": (
        """
        customer
        | join kind=leftouter (
            orders | summarize n_orders = count() by o_custkey
          ) on c_custkey == o_custkey
        | project c_custkey, n_orders = coalesce(n_orders, 0)
        """,
        """
        SELECT c_custkey, coalesce(n_orders, 0) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, count(*) AS n_orders
                   FROM orders GROUP BY o_custkey) o
          ON c_custkey = o_custkey
        """,
    ),
    # innerunique: left side deduplicated before the join (pql.go:201-214)
    "pql_join_innerunique": (
        """
        lineitem
        | project l_orderkey
        | join kind=innerunique (orders) on l_orderkey == o_orderkey
        | summarize n = count() by o_orderstatus
        """,
        """
        SELECT o_orderstatus, count(*) AS n
        FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        """,
    ),
    # EXTENSION join flavors (reference rejects these, SURVEY §2.3):
    # leftsemi — keep customers having a big order; left columns only
    "pql_join_leftsemi": (
        """
        customer
        | join kind=leftsemi (orders | where o_totalprice > 250000)
            on c_custkey == o_custkey
        | summarize n = count() by c_mktsegment
        | sort by c_mktsegment asc
        """,
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_totalprice > 250000
                        AND o_custkey = c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
    ),
    # leftanti — customers with no high-value orders
    "pql_join_leftanti": (
        """
        customer
        | join kind=leftanti (orders | where o_totalprice > 200000)
            on c_custkey == o_custkey
        | summarize n = count() by c_nationkey
        | sort by c_nationkey asc
        """,
        """
        SELECT c_nationkey, count(*) AS n
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_totalprice > 200000
                            AND o_custkey = c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """,
    ),
    # rightouter — per-customer order counts, customers preserved
    "pql_join_rightouter": (
        """
        orders
        | summarize n_orders = count() by o_custkey
        | join kind=rightouter (customer) on o_custkey == c_custkey
        | project c_custkey, n_orders = coalesce(n_orders, 0)
        """,
        """
        SELECT c_custkey, coalesce(n_orders, 0) AS n_orders
        FROM (SELECT o_custkey, count(*) AS n_orders
              FROM orders GROUP BY o_custkey) o
        RIGHT JOIN customer ON o_custkey = c_custkey
        """,
    ),
    # fullouter — nation-level customer/supplier counts, both preserved
    "pql_join_fullouter": (
        """
        customer
        | summarize c_n = count() by c_nationkey
        | join kind=fullouter (
            supplier | summarize s_n = count() by s_nationkey
          ) on c_nationkey == s_nationkey
        | project k = coalesce(c_nationkey, s_nationkey),
                  c_n = coalesce(c_n, 0), s_n = coalesce(s_n, 0)
        | sort by k asc
        """,
        """
        SELECT coalesce(c_nationkey, s_nationkey) AS k,
               coalesce(c_n, 0) AS c_n, coalesce(s_n, 0) AS s_n
        FROM (SELECT c_nationkey, count(*) AS c_n
              FROM customer GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey, count(*) AS s_n
                   FROM supplier GROUP BY s_nationkey) s
          ON c_nationkey = s_nationkey
        ORDER BY k
        """,
    ),
    # rightsemi / rightanti — right side drives, right columns out
    "pql_join_rightsemi": (
        """
        orders
        | where o_orderpriority == "1-URGENT"
        | join kind=rightsemi (customer) on o_custkey == c_custkey
        | summarize n = count() by c_mktsegment
        | sort by c_mktsegment asc
        """,
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_orderpriority = '1-URGENT'
                        AND o_custkey = c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
    ),
    # TPC-H Q14-style: fact-fact join + conditional aggregation (iff)
    "pql_promo_revenue": (
        """
        lineitem
        | where l_shipdate >= "1995-09-01" and l_shipdate < "1995-10-01"
        | join kind=inner (part) on l_partkey == p_partkey
        | summarize promo = round(sum(iff(startswith(p_type, "PROMO"),
                                          l_extendedprice * (1 - l_discount),
                                          0.0)), 2),
                    total = round(sum(l_extendedprice * (1 - l_discount)), 2)
        """,
        """
        SELECT round(sum(CASE WHEN coalesce(starts_with(p_type, 'PROMO'),
                                            FALSE)
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 2) AS promo,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'
        """,
    ),
    # three-way join chain through the dimension hierarchy
    "pql_3way_join": (
        """
        customer
        | join kind=inner (nation) on c_nationkey == n_nationkey
        | join kind=inner (region) on n_regionkey == r_regionkey
        | summarize n = count(), bal = round(sum(c_acctbal), 2) by r_name
        | sort by r_name asc
        """,
        """
        SELECT r_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    ),
    # scalar function rewrites: iff / strcat / tolower
    "pql_iff_strcat": (
        """
        nation
        | project n_name,
                  tag = iff(n_regionkey >= 2, strcat(n_name, "!"),
                            tolower(n_name))
        | sort by n_name asc
        """,
        """
        SELECT n_name,
               CASE WHEN coalesce(n_regionkey >= 2, FALSE)
                    THEN n_name || '!' ELSE lower(n_name) END AS tag
        FROM nation ORDER BY n_name
        """,
    ),
    # predicate functions as projected booleans: =~, isnotnull, not()
    "pql_predicates": (
        """
        supplier
        | project s_name,
                  ci = s_name =~ "SUPPLIER#000000001",
                  ni = isnotnull(s_acctbal),
                  neg = not(s_acctbal > 0)
        """,
        """
        SELECT s_name,
               lower(s_name) = lower('SUPPLIER#000000001') AS ci,
               s_acctbal IS NOT NULL AS ni,
               NOT (s_acctbal > 0) AS neg
        FROM supplier
        """,
    ),
    # null-safe == / countif / isnull on a column with synthesized NULLs
    "pql_null_semantics": (
        """
        events
        | extend v = iff(value >= 50, value, null)
        | summarize n_null = countif(isnull(v)),
                    n_big = countif(v > 90),
                    n = count()
        """,
        """
        SELECT count(*) FILTER (WHERE v IS NULL) AS n_null,
               count(*) FILTER (WHERE v > 90) AS n_big,
               count(*) AS n
        FROM (SELECT CASE WHEN coalesce(value >= 50, FALSE)
                          THEN value ELSE NULL END AS v
              FROM events) t
        """,
    ),
    # let bindings + modulo arithmetic + null-safe ==
    "pql_let_arith": (
        """
        let cutoff = 50;
        events
        | where value > cutoff and event_id % 7 == 3
        | project event_id, event_type, v2 = value * 2 - 1
        """,
        """
        SELECT event_id, event_type, value * 2 - 1 AS v2
        FROM events
        WHERE value > 50 AND coalesce((event_id % 7) = 3, FALSE)
        """,
    ),
    # in-list predicate (Catalyst In → parquet pushdown)
    "pql_in": (
        """
        events
        | where event_type in ("click", "purchase") and value < 5
        | project event_id, event_type, value
        """,
        """
        SELECT event_id, event_type, value
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value < 5
        """,
    ),
    # summarize by with no aggregates ⇒ DISTINCT over the keys
    "pql_summarize_by": (
        """
        orders
        | summarize by o_orderstatus, o_orderpriority
        | sort by o_orderstatus asc, o_orderpriority asc
        """,
        """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus, o_orderpriority
        """,
    ),
    # `as` binding + self-join through the bound name (As golden pattern)
    "pql_as_selfjoin": (
        """
        events
        | where event_type == "click"
        | as C
        | summarize n_clicks = count() by user_id
        | join kind=leftouter (
            C | where value > 90 | summarize n_big = count() by user_id
          ) on user_id
        | project user_id, n_clicks, n_big = coalesce(n_big, 0)
        """,
        """
        WITH c AS (SELECT * FROM events
                   WHERE coalesce(event_type = 'click', FALSE))
        SELECT a.user_id AS user_id, n_clicks, coalesce(n_big, 0) AS n_big
        FROM (SELECT user_id, count(*) AS n_clicks FROM c GROUP BY user_id) a
        LEFT JOIN (SELECT user_id, count(*) AS n_big FROM c
                   WHERE value > 90 GROUP BY user_id) b
          ON a.user_id = b.user_id
        """,
    ),
    # render: pass-through + literal metadata columns
    "pql_render": (
        """
        region
        | summarize n = count() by r_name
        | render barchart with (title = "Regions")
        """,
        """
        SELECT r_name, count(*) AS n,
               'barchart' AS render_type, 'Regions' AS render_prop_title
        FROM region GROUP BY r_name
        """,
    ),
    # x[i] indexing — 1-based array access on the embedding column
    "pql_index": (
        """
        embeddings
        | project vec_id, label, first = double(embedding[1])
        """,
        """
        SELECT vec_id, label,
               CAST(embedding[1] AS DOUBLE) AS first
        FROM embeddings
        """,
    ),
    # extend: appended computed column, then filtered/projected
    "pql_extend": (
        """
        events
        | extend vk = value * 2
        | where vk > 190
        | project event_id, vk
        """,
        """
        SELECT event_id, value * 2 AS vk
        FROM events WHERE value * 2 > 190
        """,
    ),
    # passthrough function into Spark's registry (JSON extraction);
    # the oracle uses DuckDB's equivalent — results must agree
    "pql_json_props": (
        """
        events
        | extend k = get_json_object(props, "$.k")
        | summarize n = count() by k
        | sort by k asc
        """,
        """
        SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
        FROM events GROUP BY k ORDER BY k
        """,
    ),
    # unnamed aggregates are named by their source text (pql.go:424-426)
    "pql_sourcetext_name": (
        """
        events
        | summarize min(value), max(value) by event_type
        | sort by event_type asc
        """,
        """
        SELECT event_type,
               min(value) AS "min(value)", max(value) AS "max(value)"
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    # extension operators (KQL-style; the reference rejects these)
    "pql_distinct_op": (
        "events | distinct event_type | sort by event_type asc",
        "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    ),
    "pql_union_op": (
        """
        events
        | where value > 99 | project event_id, event_type
        | union (events | where value < 1 | project event_id, event_type)
        """,
        """
        SELECT event_id, event_type FROM events WHERE value > 99
        UNION ALL
        SELECT event_id, event_type FROM events WHERE value < 1
        """,
    ),
    "pql_project_away": (
        """
        events
        | project-away props, ts, value
        | sort by event_id asc
        """,
        """
        SELECT event_id, user_id, event_type FROM events
        ORDER BY event_id
        """,
    ),
    "pql_mv_expand": (
        """
        embeddings
        | where vec_id < 3
        | mv-expand v = embedding
        | summarize n = count(), s = round(sum(double(v)), 4) by vec_id
        | sort by vec_id asc
        """,
        """
        SELECT vec_id, count(*) AS n,
               round(sum(CAST(u.v AS DOUBLE)), 4) AS s
        FROM embeddings, unnest(embedding) AS u(v)
        WHERE vec_id < 3
        GROUP BY vec_id ORDER BY vec_id
        """,
    ),
    "pql_lookup": (
        """
        orders
        | project o_orderkey, custkey = o_custkey, o_totalprice
        | lookup (customer | project custkey = c_custkey, c_mktsegment)
            on custkey
        | summarize n = count(), total = round(sum(o_totalprice), 2)
            by c_mktsegment
        | sort by c_mktsegment asc
        """,
        """
        SELECT c_mktsegment, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST
        """,
    ),
    "pql_parse_op": (
        """
        documents
        | parse source with "src" srcnum
        | summarize n = count() by srcnum
        | sort by srcnum asc
        """,
        r"""
        SELECT regexp_extract(source, '^src(.*)$', 1) AS srcnum,
               count(*) AS n
        FROM documents GROUP BY srcnum ORDER BY srcnum
        """,
    ),
    # EXTENSION parse-kv (delimited key-value extraction with typed
    # casts) + parse-where (pattern-matching row filter) — round 3
    "pql_parse_kv": (
        """
        events
        | extend kv = strcat("type=", event_type, ";uid=",
                             tostring(user_id))
        | parse-kv kv as (type, uid: long)
        | where isnotnull(uid)
        | parse-where type with "pur" rest
        | summarize n = count(), u = dcount(uid) by type, rest
        | sort by type asc
        """,
        """
        SELECT 'purchase' AS type, 'chase' AS rest, count(*) AS n,
               count(DISTINCT user_id) AS u
        FROM events WHERE event_type = 'purchase'
        """,
    ),
    "pql_search_op": (
        """
        documents
        | project doc_id, lang, source, text
        | search "spark"
        | summarize n = count() by lang
        | sort by lang asc
        """,
        """
        SELECT lang, count(*) AS n FROM documents
        WHERE coalesce(
            contains(lower(CAST(doc_id AS VARCHAR)), 'spark')
            OR contains(lower(lang), 'spark')
            OR contains(lower(source), 'spark')
            OR contains(lower(text), 'spark'), FALSE)
        GROUP BY lang ORDER BY lang
        """,
    ),
    # make-series → per-bin arrays, then multi-column mv-expand zips the
    # axis + value arrays back to one row per (group, bin) — scalar
    # output so the driver can hash it
    "pql_make_series": (
        """
        events
        | make-series n = count() default = 0,
                      s = round(sum(value), 2) default = 0.0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | mv-expand n, s, ts
        | sort by event_type asc, ts asc
        """,
        """
        WITH f AS (SELECT event_type, ts, value FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-31'),
        g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n, round(sum(value), 2) AS s
              FROM f GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i
                 FROM (SELECT DISTINCT event_type FROM f) t
                 CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j)
        SELECT grid.event_type,
               coalesce(g.n, 0) AS n,
               CAST(coalesce(g.s, 0.0) AS DOUBLE) AS s,
               TIMESTAMP '2024-01-01' + to_microseconds(grid.i * 86400000000)
                   AS ts
        FROM grid LEFT JOIN g
          ON g.event_type = grid.event_type AND g.i = grid.i
        ORDER BY grid.event_type, ts
        """,
    ),
    "pql_pivot": (
        """
        events
        | project user_id, event_type
        | evaluate pivot(event_type)
        | sort by user_id asc
        """,
        """
        SELECT user_id,
               nullif(count(CASE WHEN event_type = 'click' THEN 1 END), 0)
                   AS click,
               nullif(count(CASE WHEN event_type = 'error' THEN 1 END), 0)
                   AS error,
               nullif(count(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
                   AS purchase,
               nullif(count(CASE WHEN event_type = 'signup' THEN 1 END), 0)
                   AS signup,
               nullif(count(CASE WHEN event_type = 'view' THEN 1 END), 0)
                   AS view
        FROM events GROUP BY user_id ORDER BY user_id
        """,
    ),
    "pql_series_fns": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend total = series_sum(n), peak = series_max(n),
                 ma_sum = tolong(floor(series_sum(
                     series_moving_avg(n, 7)) * 10000.0 + 0.5))
        | project event_type, total, peak, ma_sum
        | sort by event_type asc
        """,
        """
        WITH g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-01'
                AND ts < TIMESTAMP '2024-01-31'
              GROUP BY 1, 2),
        m AS (SELECT event_type,
                     map_from_entries(list(row(i, n))) AS mn
              FROM g GROUP BY event_type),
        s AS (SELECT event_type,
                     [coalesce(mn[j][1], 0) FOR j IN range(0, 30)] AS n
              FROM m)
        SELECT event_type,
               CAST(list_sum(n) AS DOUBLE) AS total,
               list_max(n) AS peak,
               CAST(floor(list_sum([list_avg(n[greatest(1, i - 6):i])
                               FOR i IN range(1, 31)])
                          * 10000.0 + 0.5) AS BIGINT) AS ma_sum
        FROM s ORDER BY event_type
        """,
    ),
    "pql_series_fill": (
        """
        events
        | where value > 250
        | make-series v = min(value)
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend lin = series_fill_linear(v),
                 ff = series_fill_forward(v),
                 fc = series_fill_const(v, 0.0)
        | mv-expand lin, ff, fc
        | project event_type, lin = round(lin, 4), ff = round(ff, 4),
                  fc = round(fc, 4)
        | sort by event_type asc
        """,
        """
        WITH g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     min(value) AS v
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-01'
                AND ts < TIMESTAMP '2024-01-31'
                AND value > 250
              GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i, g.v
              FROM (SELECT DISTINCT event_type FROM g) t
              CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j
              LEFT JOIN g ON g.event_type = t.event_type AND g.i = j.i),
        w AS (SELECT event_type, i, v,
                last_value(v IGNORE NULLS) OVER
                  (PARTITION BY event_type ORDER BY i) AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY i) AS pi,
                first_value(v IGNORE NULLS) OVER
                  (PARTITION BY event_type ORDER BY i ROWS BETWEEN
                   CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY i ROWS BETWEEN
                   CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
              FROM grid),
        f AS (SELECT event_type, i,
                CASE WHEN v IS NOT NULL THEN v
                     WHEN pv IS NULL THEN nv
                     WHEN nv IS NULL THEN pv
                     ELSE pv + (nv - pv) * (i - pi) / (ni - pi) END AS lin,
                coalesce(v, pv) AS ff,
                coalesce(v, 0.0) AS fc
              FROM w)
        SELECT event_type, round(lin, 4) AS lin, round(ff, 4) AS ff,
               round(fc, 4) AS fc
        FROM f ORDER BY event_type, i
        """,
    ),
    "pql_mv_apply": (
        """
        orders
        | summarize ks = sort_array(collect_list(o_orderkey)) by o_custkey
        | mv-apply k = ks on (where k % 2 == 0
                              | summarize n_even = count(), mx = max(k))
        | project o_custkey, n_even, mx
        | sort by o_custkey asc
        """,
        """
        WITH g AS (SELECT o_custkey,
                          list(o_orderkey ORDER BY o_orderkey) AS ks
                   FROM orders GROUP BY o_custkey),
        f AS (SELECT o_custkey, u.k AS k FROM g, unnest(g.ks) AS u(k)
              WHERE k % 2 = 0)
        SELECT o_custkey, count(*) AS n_even, max(k) AS mx
        FROM f GROUP BY o_custkey ORDER BY o_custkey
        """,
    ),
    "pql_top_nested": (
        """
        events
        | top-nested 3 of event_type by n = count(),
          top-nested 2 of user_id by m = count()
        | sort by event_type asc, user_id asc
        """,
        """
        WITH l1 AS (SELECT event_type, count(*) AS n
                    FROM events GROUP BY 1),
        s1 AS (SELECT * FROM l1 ORDER BY n DESC, event_type LIMIT 3),
        l2 AS (SELECT event_type, user_id, count(*) AS m
               FROM events GROUP BY 1, 2),
        j AS (SELECT s1.event_type, s1.n, l2.user_id, l2.m,
                     row_number() OVER (PARTITION BY s1.event_type
                                        ORDER BY l2.m DESC, l2.user_id) AS rn
              FROM s1 JOIN l2 USING (event_type))
        SELECT event_type, n, user_id, m FROM j WHERE rn <= 2
        ORDER BY event_type, user_id
        """,
    ),
    "pql_range_source": (
        """
        range x from 1 to 1000 step 7
        | extend sq = x * x
        | summarize n = count(), s = sum(x), ssq = sum(sq)
        """,
        """
        SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS ssq
        FROM (SELECT unnest(generate_series(1, 1000, 7)) AS x)
        """,
    ),
    "pql_agg_family": (
        """
        events
        | summarize users = dcount(user_id),
                    hot = countif(value > 90),
                    hot_users = dcountif(user_id, value > 90),
                    s = round(sumif(value, value > 90), 2),
                    mn = round(minif(value, value > 90), 4),
                    mx = round(maxif(value, value > 90), 4)
            by event_type
        | sort by event_type asc
        """,
        """
        SELECT event_type,
               count(DISTINCT user_id) AS users,
               count(CASE WHEN value > 90 THEN 1 END) AS hot,
               count(DISTINCT CASE WHEN value > 90 THEN user_id END)
                   AS hot_users,
               round(sum(CASE WHEN value > 90 THEN value END), 2) AS s,
               round(min(CASE WHEN value > 90 THEN value END), 4) AS mn,
               round(max(CASE WHEN value > 90 THEN value END), 4) AS mx
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    "pql_datatable": (
        """
        datatable (k: long, grp: string, w: real)
            [1, "a", 1.5, 2, "b", 2.5, 3, "a", 4.0, 4, "b", null]
        | where w >= 0
        | summarize n = count(), s = round(sum(w), 4) by grp
        | sort by grp asc
        """,
        """
        SELECT grp, count(*) AS n, round(sum(w), 4) AS s
        FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'a', 4.0),
                     (4, 'b', CAST(NULL AS DOUBLE))) AS t(k, grp, w)
        WHERE w >= 0
        GROUP BY grp ORDER BY grp
        """,
    ),
    "pql_print": (
        'print x = 1 + 1, y = strcat("a", "b"), z = iff(3 > 2, "yes", "no")',
        "SELECT 2 AS x, 'ab' AS y, 'yes' AS z",
    ),
    "pql_sample_op": (
        """
        documents
        | sample 0.3 by doc_id
        | summarize n = count() by lang
        | sort by lang asc
        """,
        f"""
        SELECT lang, count(*) AS n FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              < {int(0.3 * (1 << 32))}
        GROUP BY lang ORDER BY lang
        """,
    ),
    "pql_top_hitters": (
        "events | top-hitters 5 of event_type",
        """
        SELECT event_type, count(*) AS hitters FROM events
        GROUP BY event_type ORDER BY hitters DESC, event_type LIMIT 5
        """,
    ),
    "pql_project_ops": (
        """
        orders
        | project-rename key = o_orderkey, price = o_totalprice
        | project-keep key, price, o_orderpriority
        | project-reorder price, key
        | sort by price desc, key asc
        | take 10
        """,
        """
        SELECT o_totalprice AS price, o_orderkey AS key, o_orderpriority
        FROM orders ORDER BY price DESC, key LIMIT 10
        """,
    ),
    "pql_getschema": (
        "documents | getschema",
        """
        SELECT * FROM (VALUES
          ('doc_id', 0, 'bigint'), ('text', 1, 'string'),
          ('lang', 2, 'string'), ('source', 3, 'string'),
          ('n_chars', 4, 'bigint'))
        AS t(ColumnName, ColumnOrdinal, DataType)
        """,
    ),
    "pql_string_preds": (
        """
        documents
        | where text contains "SPARK" or source startswith "SRC1"
            or source endswith "9"
        | extend hastable = iff(text has "Table", 1, 0)
        | summarize n = count(), n_has = sum(hastable) by lang
        | sort by lang asc
        """,
        """
        SELECT lang, count(*) AS n,
               CAST(sum(CASE WHEN list_contains(
                   string_split_regex(lower(text), '[^a-zA-Z0-9]+'),
                   'table') THEN 1 ELSE 0 END) AS BIGINT) AS n_has
        FROM documents
        WHERE contains(lower(text), 'spark')
           OR starts_with(lower(source), 'src1')
           OR ends_with(lower(source), '9')
        GROUP BY lang ORDER BY lang
        """,
    ),
    "pql_serialize_window": (
        """
        events
        | sort by ts asc, event_id asc
        | serialize by user_id
        | extend rn = row_number(), pv = prev(value), nv = next(value, 1, 0.0)
        | where rn <= 3
        | project user_id, event_id, rn,
                  pv = round(pv, 4), nv = round(nv, 4)
        """,
        """
        WITH w AS (
          SELECT user_id, event_id,
                 row_number() OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                 lag(value) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
                 coalesce(lead(value) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS nv
          FROM events)
        SELECT user_id, event_id, rn, round(pv, 4) AS pv, round(nv, 4) AS nv
        FROM w WHERE rn <= 3
        """,
    ),
    # EXTENSION KQL string/scalar function family (SURVEY §2.6)
    "pql_string_fns": (
        """
        nation
        | project n_nationkey,
                  a = strlen(n_name),
                  b = substring(n_name, 0, 3),
                  c = indexof(n_name, "A"),
                  d = tostring(n_nationkey),
                  e = strcat_delim("-", n_name, tostring(n_nationkey)),
                  f = extract("^(..)", 1, n_name),
                  g = strcmp(n_name, "JAPAN"),
                  h = countof(n_name, "A")
        | sort by n_nationkey asc
        """,
        """
        SELECT n_nationkey,
               length(n_name) AS a,
               substr(n_name, 1, 3) AS b,
               strpos(n_name, 'A') - 1 AS c,
               CAST(n_nationkey AS VARCHAR) AS d,
               concat_ws('-', n_name, CAST(n_nationkey AS VARCHAR)) AS e,
               regexp_extract(n_name, '^(..)', 1) AS f,
               CASE WHEN n_name < 'JAPAN' THEN -1
                    WHEN n_name > 'JAPAN' THEN 1 ELSE 0 END AS g,
               CAST((length(n_name) - length(replace(n_name, 'A', '')))
                    AS BIGINT) AS h
        FROM nation ORDER BY n_nationkey
        """,
    ),
    # EXTENSION KQL datetime function family
    "pql_datetime_fns": (
        """
        events
        | where event_id < 3000
        | project event_id,
                  d = startofday(ts),
                  m = startofmonth(ts),
                  w = dayofweek(ts),
                  mo = getmonth(ts),
                  nx = datetime_add("day", 1, ts),
                  hrs = datetime_diff("hour", ts, startofday(ts))
        | sort by event_id asc
        """,
        """
        SELECT event_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
               CAST(dayofweek(ts) AS INT) AS w,
               CAST(month(ts) AS INT) AS mo,
               ts + INTERVAL 1 DAY AS nx,
               CAST(date_diff('hour', date_trunc('day', ts), ts)
                    AS BIGINT) AS hrs
        FROM events WHERE event_id < 3000 ORDER BY event_id
        """,
    ),
    # EXTENSION KQL aggregate family: arg_max/arg_min/make_set/stdev
    "pql_arg_agg": (
        """
        orders
        | summarize k_max = arg_max(o_totalprice, o_orderkey),
                    k_min = arg_min(o_totalprice, o_orderkey),
                    pr = strcat_array(make_set(o_orderpriority), ","),
                    sd = round(stdev(o_totalprice), 2)
            by o_orderstatus
        | sort by o_orderstatus asc
        """,
        """
        SELECT o_orderstatus,
               arg_max(o_orderkey, o_totalprice) AS k_max,
               arg_min(o_orderkey, o_totalprice) AS k_min,
               array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
                   AS pr,
               round(stddev_samp(o_totalprice), 2) AS sd
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
    ),
    # EXTENSION case() bucketing
    "pql_case_fn": (
        """
        lineitem
        | summarize n = count()
            by b = case(l_quantity < 10, "small",
                        l_quantity < 30, "mid", "large")
        | sort by b asc
        """,
        """
        SELECT CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'large' END AS b,
               count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY b
        """,
    ),
    # exact interpolated percentiles, KQL 0-100 scale (Spark
    # `percentile` == DuckDB `quantile_cont`, both linear interpolation)
    "pql_percentiles": (
        """
        events
        | summarize p50 = round(percentile(value, 50), 4),
                    p95 = round(percentile(value, 95), 4)
            by event_type
        | sort by event_type asc
        """,
        """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    # bin() extension: epoch-aligned time bucketing in a group key (the
    # batch twin of streaming windows)
    "pql_bin_hourly": (
        """
        events
        | where event_type == "purchase"
        | summarize n = count() by hour = bin(ts, "6 hours")
        | sort by hour asc
        """,
        """
        SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600)
                    AS TIMESTAMP) AS hour,
               count(*) AS n
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY hour ORDER BY hour
        """,
    ),
    # EXTENSION weighted percentiles (Spark percentile frequency arg ==
    # DuckDB quantile_cont over the unnest-expanded multiset) + bitwise
    # aggregates (round 3)
    "pql_weighted_aggs": (
        """
        events
        | extend w = toint(user_id % 3 + 1)
        | summarize pw = tolong(floor(
                        percentilew(value, w, 50) * 10000.0 + 0.5)),
                    ba = binary_all_and(user_id),
                    bo = binary_all_or(user_id),
                    bx = binary_all_xor(user_id)
            by event_type
        | sort by event_type asc
        """,
        """
        WITH base AS (
          SELECT event_type, value, user_id,
                 CAST(user_id % 3 + 1 AS INT) AS w
          FROM events
        ),
        rep AS (
          SELECT event_type, value FROM base, unnest(range(base.w))
        ),
        p AS (
          SELECT event_type,
                 CAST(floor(quantile_cont(value, 0.5) * 10000.0 + 0.5)
                      AS BIGINT) AS pw
          FROM rep GROUP BY event_type
        ),
        b AS (
          SELECT event_type, bit_and(user_id) AS ba,
                 bit_or(user_id) AS bo, bit_xor(user_id) AS bx
          FROM base GROUP BY event_type
        )
        SELECT p.event_type, p.pw, b.ba, b.bo, b.bx
        FROM p JOIN b USING (event_type) ORDER BY event_type
        """,
    ),
    # EXTENSION parse_url/parse_urlquery + totimespan — VALUES oracle
    # precomputed with Python's urllib.parse / manual math (round 3)
    "pql_url_fns": (
        """
        datatable(id: long, url: string, dur: string) [
            1, "https://user:pw@example.com:8080/a/b?x=1&y=2#frag",
               "01:30:00",
            2, "http://example.org/path?q=hello", "1.00:00:30.5",
            3, "not a url", "bogus",
        ]
        | extend u = parse_url(url)
        | project id, scheme = u.Scheme, host = u.Host, port = u.Port,
            path = u.Path, frag = u.Fragment,
            q1 = u.QueryParameters["q"],
            secs = unix_micros(datetime(1970-01-01) + totimespan(dur))
                   / 1000000.0
        | sort by id asc
        """,
        """
        SELECT id, scheme, host, port, path, frag, q1,
               CAST(secs AS DOUBLE) AS secs
        FROM (VALUES
          (1, 'https', 'example.com', '8080', '/a/b', 'frag', NULL,
           5400.0),
          (2, 'http', 'example.org', '', '/path', '', 'hello', 86430.5),
          -- invalid URL: try_parse_url parts are NULL; the coalesced
          -- Port/Fragment fields surface as empty strings
          (3, NULL, NULL, '', NULL, '', NULL, NULL)
        ) AS t(id, scheme, host, port, path, frag, q1, secs)
        ORDER BY id
        """,
    ),
    # EXTENSION KQL IPv6 family: canonicalization, prefix masks, range
    # membership — pure Catalyst 32-nibble hex algebra (round 3).  The
    # oracle is a VALUES twin precomputed with Python's stdlib
    # `ipaddress` module (an independent reference implementation).
    "pql_ipv6_fns": (
        """
        datatable(id: long, ip: string) [
            1, "::1",
            2, "fe80::85d:e82c:9446:7994",
            3, "192.168.255.255",
            4, "2001:DB8:0:0:0:0:1:1",
            5, "::ffff:10.1.2.3",
            6, "1::8",
            7, "bogus",
        ]
        | project id, c = parse_ipv6(ip),
            m = parse_ipv6_mask(ip, 64),
            inr = ipv6_is_in_range(ip, "fe80::/10"),
            v4m = ipv4_is_match(ip, "192.168.0.9/16")
        | sort by id asc
        """,
        """
        SELECT * FROM (VALUES
          (1, '0000:0000:0000:0000:0000:0000:0000:0001',
              '0000:0000:0000:0000:0000:0000:0000:0000', FALSE, NULL),
          (2, 'fe80:0000:0000:0000:085d:e82c:9446:7994',
              'fe80:0000:0000:0000:0000:0000:0000:0000', TRUE, NULL),
          (3, '0000:0000:0000:0000:0000:ffff:c0a8:ffff',
              '0000:0000:0000:0000:0000:0000:0000:0000', FALSE, TRUE),
          (4, '2001:0db8:0000:0000:0000:0000:0001:0001',
              '2001:0db8:0000:0000:0000:0000:0000:0000', FALSE, NULL),
          (5, '0000:0000:0000:0000:0000:ffff:0a01:0203',
              '0000:0000:0000:0000:0000:0000:0000:0000', FALSE, NULL),
          (6, '0001:0000:0000:0000:0000:0000:0000:0008',
              '0001:0000:0000:0000:0000:0000:0000:0000', FALSE, NULL),
          (7, NULL, NULL, NULL, NULL)
        ) AS t(id, c, m, inr, v4m) ORDER BY id
        """,
    ),
    # EXTENSION bare timespan literals (1h/3h/1d → day-time intervals)
    # + datetime() literals: native timestamp arithmetic, epoch-aligned
    # bin with a bare timespan (round 3)
    "pql_timespan_lit": (
        """
        events
        | where ts >= datetime(2024-01-02)
            and ts < datetime(2024-01-02) + 1d
        | summarize n = count(),
                    v = tolong(floor(sum(value) * 1000.0 + 0.5))
            by h = bin(ts, 3h)
        | sort by h asc
        """,
        """
        SELECT CAST(to_timestamp(floor(epoch(ts) / 10800) * 10800)
                    AS TIMESTAMP) AS h,
               count(*) AS n,
               CAST(floor(sum(value) * 1000.0 + 0.5) AS BIGINT) AS v
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-02'
          AND ts < TIMESTAMP '2024-01-02' + INTERVAL 1 DAY
        GROUP BY h ORDER BY h
        """,
    ),
    # EXTENSION in-family word operators + between (round 2)
    "pql_in_family": (
        """
        customer
        | where c_acctbal between (1000.0 .. 5000.0)
        | where c_mktsegment in~ ("BUILDING", "machinery")
        | where c_nationkey !in (0, 1, 2)
        | extend hit = iff(c_name has_any ("000000042", "000000777"), 1, 0)
        | summarize n = count(), hits = sum(hit) by c_mktsegment
        | sort by c_mktsegment asc
        """,
        """
        SELECT c_mktsegment, count(*) AS n,
               CAST(sum(CASE WHEN list_contains(
                        string_split_regex(lower(c_name),
                                           '[^a-zA-Z0-9]+'), '000000042')
                    OR list_contains(
                        string_split_regex(lower(c_name),
                                           '[^a-zA-Z0-9]+'), '000000777')
                    THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM customer
        WHERE c_acctbal BETWEEN 1000.0 AND 5000.0
          AND lower(c_mktsegment) IN ('building', 'machinery')
          AND c_nationkey NOT IN (0, 1, 2)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
    ),
    # EXTENSION sketch aggregates: HLL dcount accuracy tiers + mergeable
    # hll()/hll_merge()/dcount_hll() (Datasketches sparse mode is exact
    # at sf0.01 cardinalities, so the oracle can be exact SQL)
    "pql_sketch_fns": (
        """
        events
        | summarize exact = dcount(user_id),
                    approx = dcount(user_id, 2)
            by event_type
        | sort by event_type asc
        """,
        """
        SELECT event_type,
               count(DISTINCT user_id) AS exact,
               count(DISTINCT user_id) AS approx
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    # EXTENSION partition operator: per-key subquery with no iteration
    # (rank window / key-prefixed groupBy)
    "pql_partition_op": (
        """
        events
        | partition by event_type ( top 3 by value )
        | project event_type, event_id, value = round(value, 4)
        | sort by event_type asc, event_id asc
        """,
        """
        SELECT event_type, event_id, round(value, 4) AS value
        FROM (SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC) AS rn
              FROM events) t
        WHERE rn <= 3
        ORDER BY event_type, event_id
        """,
    ),
    # EXTENSION evaluate bag_unpack: dynamic JSON column → typed columns
    "pql_bag_unpack": (
        """
        events
        | evaluate bag_unpack(props, "p_")
        | where toint(p_k) >= 50
        | summarize n = count(), mx = max(toint(p_k)) by event_type
        | sort by event_type asc
        """,
        """
        SELECT event_type, count(*) AS n,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INT))
                    AS INT) AS mx
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        GROUP BY event_type ORDER BY event_type
        """,
    ),
    # EXTENSION bag_unpack with the ADX output-schema annotation:
    # static typed keys (no discovery action), missing keys NULL —
    # exercised through BOTH the declared type cast and a key absent
    # from every bag
    "pql_bag_unpack_schema": (
        """
        events
        | evaluate bag_unpack(props, "p_") : (k: long, missing: string)
        | where p_k >= 50
        | summarize n = count(), mx = max(p_k),
                    miss = countif(isnull(p_missing)) by event_type
        | sort by event_type asc
        """,
        """
        SELECT event_type, count(*) AS n,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS mx,
               CAST(count(*) FILTER (
                 WHERE json_extract_string(props, '$.missing') IS NULL
               ) AS BIGINT) AS miss
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        GROUP BY event_type ORDER BY event_type
        """,
    ),
    # EXTENSION tabular let (reference rejects; README.md:72-73)
    "pql_tabular_let": (
        """
        let Hot = events | where value > 250;
        let Cold = events | where value <= 250;
        Hot
        | join kind=leftanti (Cold) on user_id
        | summarize n = count(), u = dcount(user_id)
        """,
        """
        WITH hot AS (SELECT * FROM events WHERE value > 250),
        cold AS (SELECT * FROM events WHERE value <= 250)
        SELECT count(*) AS n, count(DISTINCT user_id) AS u
        FROM hot WHERE user_id NOT IN (SELECT user_id FROM cold)
        """,
    ),
    # EXTENSION scan operator: ordered funnel matching (predicates in
    # Catalyst, tiny automaton in an Arrow kernel).  The DuckDB twin
    # runs the same greedy automaton as a sequential left fold:
    # list_reduce over per-user event lists built with an ORDER BY
    # aggregate.  State encoding: state = 4*completed + pos; an event
    # advances iff its step index equals pos; completing step 2 rolls
    # pos to 0 and increments the match count.  (An earlier twin that
    # put the CASE inside the ordered list() aggregate mis-evaluated
    # under parallel grouped aggregation in DuckDB 1.0 — pre-computing
    # the step index in a subquery and filtering to step events first
    # is stable; verified against a python reference automaton over 5
    # repeated runs at sf0.01 and sf0.1.)
    "pql_scan_funnel": (
        """
        events
        | scan by user_id order by ts asc, event_id asc with (
            step viewed: event_type == "view";
            step clicked: event_type == "click";
            step bought: event_type == "purchase";
          )
        | summarize funnels = count() / 3, users = dcount(user_id)
        """,
        """
        WITH per_user AS (
          SELECT user_id,
                 list_reduce(
                   list_concat([CAST(0 AS BIGINT)],
                               list(s ORDER BY ts, event_id)),
                   (acc, x) -> CASE WHEN x = acc % 4
                                    THEN CASE WHEN acc % 4 = 2
                                         THEN (acc // 4 + 1) * 4
                                         ELSE acc + 1 END
                                    ELSE acc END
                 ) // 4 AS n_matches
          FROM (SELECT user_id, ts, event_id,
                       CAST(CASE event_type WHEN 'view' THEN 0
                            WHEN 'click' THEN 1 WHEN 'purchase' THEN 2
                            ELSE -1 END AS BIGINT) AS s
                FROM events
                WHERE event_type IN ('view', 'click', 'purchase'))
          GROUP BY user_id
        )
        SELECT CAST(SUM(n_matches) AS DOUBLE) AS funnels,
               CAST(COUNT(*) FILTER (WHERE n_matches > 0) AS BIGINT)
                 AS users
        FROM per_user
        """,
    ),
    # EXTENSION scan with declare/state capture + output modes —
    # iterative automaton with per-match state (rows-only check; the
    # stateless scan automaton above carries the full hash oracle, and
    # the state-capture semantics are pinned by tests/test_scan_declare)
    "pql_scan_declare": (
        """
        events
        | scan with_match_id = mid by user_id order by ts asc, event_id asc
            declare (first_t = datetime(2000-01-01), spend = 0.0)
            with (
              step viewed output=none: event_type == "view"
                  => first_t = ts;
              step bought: event_type == "purchase" => spend = value;
            )
        | summarize matches = count(), users = dcount(user_id),
                    total_spend = round(sum(spend), 2)
        """,
        # r8: the same RECURSIVE-CTE automaton device as the
        # scan_var_window twin — state (pos, match count, emitted-spend
        # sum) per user over row-numbered view/purchase events; other
        # event types match no step and are no-ops, `first_t` is
        # assigned but never read, and output=none on `viewed` means
        # only `bought` rows are emitted (matches = transitions,
        # total_spend = the emitting purchases' values; round(2)
        # absorbs float sum-order noise)
        """
        WITH RECURSIVE ev AS (
          SELECT user_id, value AS v,
                 CAST(CASE event_type WHEN 'view' THEN 0
                      ELSE 1 END AS BIGINT) AS s,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events
          WHERE event_type IN ('view', 'purchase')),
        auto AS (
          SELECT user_id, CAST(0 AS BIGINT) AS i,
                 CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n,
                 CAST(0.0 AS DOUBLE) AS sp
          FROM (SELECT DISTINCT user_id FROM ev)
          UNION ALL
          SELECT e.user_id, a.i + 1,
                 CASE WHEN e.s = 0 AND a.pos = 0 THEN 1
                      WHEN e.s = 1 AND a.pos = 1 THEN 0
                      ELSE a.pos END,
                 a.n + CASE WHEN e.s = 1 AND a.pos = 1
                            THEN 1 ELSE 0 END,
                 a.sp + CASE WHEN e.s = 1 AND a.pos = 1
                             THEN e.v ELSE 0.0 END
          FROM auto a JOIN ev e
            ON e.user_id = a.user_id AND e.i = a.i + 1),
        fin AS (SELECT user_id, arg_max(n, i) AS n,
                       arg_max(sp, i) AS sp
                FROM auto GROUP BY user_id)
        SELECT CAST(SUM(n) AS BIGINT) AS matches,
               CAST(COUNT(*) FILTER (WHERE n > 0) AS BIGINT) AS users,
               round(SUM(sp), 2) AS total_spend
        FROM fin
        """,
    ),
    # EXTENSION scan with a VAR-REFERENCING step condition (round 7:
    # full KQL-scan surface): the purchase must land within 2 days of
    # the CAPTURED view time — `ts - t0 < 2d` reads declared state, so
    # its skeleton is interpreted in the automaton while `ts`,
    # `event_type == …`, and the 2d literal stay Catalyst columns.
    # The DuckDB twin runs the same greedy automaton as a RECURSIVE
    # CTE over row-numbered per-user events (state: pos, captured t0,
    # match count).  NOT list_reduce: DuckDB 1.0.0's list_reduce gave
    # wrong per-row results for THIS lambda on the real data (57/150
    # users wrong at sf0.01 — folding the very lists the query
    # returns gives different answers in python), while the
    # scan_funnel twin's list_reduce stays correct (re-verified
    # against a python automaton this round).
    "pql_scan_var_window": (
        """
        events
        | scan by user_id order by ts asc, event_id asc
            declare (t0 = datetime(2000-01-01))
            with (
              step viewed: event_type == "view" => t0 = ts;
              step bought: event_type == "purchase" and ts - t0 < 2d;
            )
        | summarize matches = count() / 2, users = dcount(user_id)
        """,
        """
        WITH RECURSIVE ev AS (
          SELECT user_id, epoch_us(ts) AS t,
                 CAST(CASE event_type WHEN 'view' THEN 0
                      ELSE 1 END AS BIGINT) AS s,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events
          WHERE event_type IN ('view', 'purchase')),
        auto AS (
          SELECT user_id, CAST(0 AS BIGINT) AS i,
                 CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS t0,
                 CAST(0 AS BIGINT) AS n
          FROM (SELECT DISTINCT user_id FROM ev)
          UNION ALL
          SELECT e.user_id, a.i + 1,
                 CASE WHEN e.s = 0 AND a.pos = 0 THEN 1
                      WHEN e.s = 1 AND a.pos = 1
                           AND e.t - a.t0 < 172800000000 THEN 0
                      ELSE a.pos END,
                 CASE WHEN e.s = 0 AND a.pos = 0 THEN e.t
                      ELSE a.t0 END,
                 a.n + CASE WHEN e.s = 1 AND a.pos = 1
                                 AND e.t - a.t0 < 172800000000
                            THEN 1 ELSE 0 END
          FROM auto a JOIN ev e
            ON e.user_id = a.user_id AND e.i = a.i + 1),
        fin AS (SELECT user_id, arg_max(n, i) AS n
                FROM auto GROUP BY user_id)
        SELECT CAST(SUM(n) AS DOUBLE) AS matches,
               CAST(COUNT(*) FILTER (WHERE n > 0) AS BIGINT) AS users
        FROM fin
        """,
    ),
    # EXTENSION sample-distinct + toscalar scalar subquery
    "pql_sample_distinct": (
        """
        let cut = toscalar(events | summarize avg(value));
        events
        | sample-distinct 5 of user_id
        | where value > cut
        | summarize n = count(), u = dcount(user_id)
        """,
        f"""
        WITH vals AS (
          SELECT user_id FROM (SELECT DISTINCT user_id FROM events)
          ORDER BY ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT, user_id
          LIMIT 5)
        SELECT count(*) AS n, count(DISTINCT user_id) AS u
        FROM events
        WHERE user_id IN (SELECT user_id FROM vals)
          AND value > (SELECT avg(value) FROM events)
        """,
    ),
    # EXTENSION series_outliers: per-bin z-score anomaly detection over
    # make-series arrays, flattened to scalar rows via mv-expand zip
    "pql_series_outliers": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend z = series_outliers(n)
        | mv-expand n, z, ts
        | project event_type, ts, n,
                  z = tolong(floor(z * 10000.0 + 0.5))
        | sort by event_type asc, ts asc
        """,
        """
        WITH f AS (SELECT event_type, ts FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-31'),
        g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n
              FROM f GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i, coalesce(g.n, 0) AS n
                 FROM (SELECT DISTINCT event_type FROM f) t
                 CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j
                 LEFT JOIN g ON g.event_type = t.event_type
                            AND g.i = j.i),
        s AS (SELECT event_type, i, n,
                     avg(n) OVER (PARTITION BY event_type) AS m,
                     stddev_pop(n) OVER (PARTITION BY event_type) AS sd
              FROM grid)
        SELECT event_type,
               TIMESTAMP '2024-01-01' + to_microseconds(i * 86400000000)
                   AS ts,
               n,
               CAST(floor((CASE WHEN sd > 0 THEN (n - m) / sd
                                ELSE 0.0 END) * 10000.0 + 0.5)
                    AS BIGINT) AS z
        FROM s ORDER BY event_type, ts
        """,
    ),
    # EXTENSION series_decompose: additive trend/seasonal/residual
    # decomposition over make-series arrays (period-7 daily series).
    # Oracle reproduces the arithmetic with window SQL: edge-truncated
    # centered MA(7) trend, per-phase detrended means centered by the
    # partition mean, residual = n - trend - seasonal.
    "pql_series_decompose": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend d = series_decompose(n, 7)
        | mv-expand ts, b = d.baseline, t = d.trend, r = d.residual
        | project event_type, ts,
                  b = tolong(floor(b * 10000.0 + 0.5)),
                  t = tolong(floor(t * 10000.0 + 0.5)),
                  r = tolong(floor(r * 10000.0 + 0.5))
        | sort by event_type asc, ts asc
        """,
        """
        WITH f AS (SELECT event_type, ts FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-31'),
        g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n
              FROM f GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i,
                        CAST(coalesce(g.n, 0) AS DOUBLE) AS n
                 FROM (SELECT DISTINCT event_type FROM f) t
                 CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j
                 LEFT JOIN g ON g.event_type = t.event_type
                            AND g.i = j.i),
        tr AS (SELECT event_type, i, n,
                      avg(n) OVER (PARTITION BY event_type ORDER BY i
                                   ROWS BETWEEN 3 PRECEDING
                                   AND 3 FOLLOWING) AS trend
               FROM grid),
        ph AS (SELECT *, avg(n - trend) OVER
                           (PARTITION BY event_type, i % 7) AS sraw
               FROM tr),
        c AS (SELECT *, sraw - avg(sraw) OVER
                          (PARTITION BY event_type) AS seasonal
              FROM ph)
        SELECT event_type,
               TIMESTAMP '2024-01-01' + to_microseconds(i * 86400000000)
                   AS ts,
               CAST(floor((trend + seasonal) * 10000.0 + 0.5)
                    AS BIGINT) AS b,
               CAST(floor(trend * 10000.0 + 0.5) AS BIGINT) AS t,
               CAST(floor((n - trend - seasonal) * 10000.0 + 0.5)
                    AS BIGINT) AS r
        FROM c ORDER BY event_type, ts
        """,
    ),
    # EXTENSION series_decompose_forecast: train the additive
    # decomposition on the first n-points bins, forecast the horizon as
    # OLS-extrapolated trend + centered phase pattern; the oracle
    # repeats the identical training-window math (regr_slope/intercept
    # twins the closed-form OLS; integer scaling floor(x*1e4 + 0.5)
    # absorbs fold-order fp noise and is driver-hash robust — floats
    # rounded to k decimals hash-flip on cross-engine last-ulp ties)
    "pql_series_forecast": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend f = series_decompose_forecast(n, 7, 7)
        | mv-expand ts, fv = f
        | project event_type, ts,
                  fv = tolong(floor(fv * 10000.0 + 0.5))
        | sort by event_type asc, ts asc
        """,
        """
        WITH f AS (SELECT event_type, ts FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-31'),
        g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n
              FROM f GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i,
                        CAST(coalesce(g.n, 0) AS DOUBLE) AS n
                 FROM (SELECT DISTINCT event_type FROM f) t
                 CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j
                 LEFT JOIN g ON g.event_type = t.event_type
                            AND g.i = j.i),
        tr AS (SELECT event_type, i, n,
                      avg(n) OVER (PARTITION BY event_type ORDER BY i
                                   ROWS BETWEEN 3 PRECEDING
                                   AND 3 FOLLOWING) AS trend
               FROM grid WHERE i < 23),
        ph AS (SELECT *, avg(n - trend) OVER
                           (PARTITION BY event_type, i % 7) AS sraw
               FROM tr),
        st AS (SELECT event_type, avg(sraw) AS rawmean,
                      regr_slope(trend, i + 1) AS slope,
                      regr_intercept(trend, i + 1) AS inter
               FROM ph GROUP BY event_type),
        ps AS (SELECT event_type, i % 7 AS q, any_value(sraw) AS psv
               FROM ph GROUP BY 1, 2)
        SELECT grid.event_type,
               TIMESTAMP '2024-01-01'
                 + to_microseconds(grid.i * 86400000000) AS ts,
               CAST(floor((CASE WHEN grid.i < 23
                     THEN b.trend + b.sraw - st.rawmean
                     ELSE st.inter + st.slope * (grid.i + 1)
                          + ps.psv - st.rawmean END)
                          * 10000.0 + 0.5) AS BIGINT) AS fv
        FROM grid
        LEFT JOIN ph b ON b.event_type = grid.event_type
                      AND b.i = grid.i
        JOIN st ON st.event_type = grid.event_type
        JOIN ps ON ps.event_type = grid.event_type
               AND ps.q = grid.i % 7
        ORDER BY grid.event_type, ts
        """,
    ),
    # EXTENSION series_decompose_anomalies: ±1 flags on residual
    # population z-scores past the threshold
    "pql_series_decompose_anomalies": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend d = series_decompose_anomalies(n, 7, 2.0)
        | mv-expand ts, flag = d.ad_flag, sc = d.ad_score
        | project event_type, ts, flag,
                  sc = tolong(floor(sc * 10000.0 + 0.5))
        | sort by event_type asc, ts asc
        """,
        """
        WITH f AS (SELECT event_type, ts FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-31'),
        g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n
              FROM f GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i,
                        CAST(coalesce(g.n, 0) AS DOUBLE) AS n
                 FROM (SELECT DISTINCT event_type FROM f) t
                 CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j
                 LEFT JOIN g ON g.event_type = t.event_type
                            AND g.i = j.i),
        tr AS (SELECT event_type, i, n,
                      avg(n) OVER (PARTITION BY event_type ORDER BY i
                                   ROWS BETWEEN 3 PRECEDING
                                   AND 3 FOLLOWING) AS trend
               FROM grid),
        ph AS (SELECT *, avg(n - trend) OVER
                           (PARTITION BY event_type, i % 7) AS sraw
               FROM tr),
        c AS (SELECT *, n - trend
                        - (sraw - avg(sraw) OVER
                             (PARTITION BY event_type)) AS resid
              FROM ph),
        z AS (SELECT *,
                     avg(resid) OVER (PARTITION BY event_type) AS rm,
                     stddev_pop(resid) OVER (PARTITION BY event_type)
                         AS rs
              FROM c)
        SELECT event_type,
               TIMESTAMP '2024-01-01' + to_microseconds(i * 86400000000)
                   AS ts,
               CAST(CASE WHEN rs > 0 AND (resid - rm) / rs >= 2.0 THEN 1
                         WHEN rs > 0 AND (resid - rm) / rs <= -2.0
                           THEN -1
                         ELSE 0 END AS BIGINT) AS flag,
               CAST(floor((CASE WHEN rs > 0 THEN (resid - rm) / rs
                          ELSE 0.0 END) * 10000.0 + 0.5)
                    AS BIGINT) AS sc
        FROM z ORDER BY event_type, ts
        """,
    ),
    # EXTENSION series_stats + series_fit_line over make-series arrays;
    # the oracle uses DuckDB's regression aggregates (regr_slope/
    # regr_intercept/regr_r2 ≡ OLS against the bin index) and a window
    # min for the first-occurrence min index
    "pql_series_stats_fit": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend st = series_stats(n), fl = series_fit_line(n)
        | project event_type, mn = st.min, mni = st.min_idx,
                  mx = st.max,
                  av = tolong(floor(st.avg * 10000.0 + 0.5)),
                  sd = tolong(floor(st.stdev * 10000.0 + 0.5)),
                  slope = tolong(floor(iff(isfinite(fl.slope),
                      fl.slope, todouble(null)) * 10000.0 + 0.5)),
                  icpt = tolong(floor(iff(isfinite(fl.interception),
                      fl.interception, todouble(null))
                      * 10000.0 + 0.5)),
                  rsq = tolong(floor(iff(isfinite(fl.rsquare),
                      fl.rsquare, todouble(null)) * 10000.0 + 0.5))
        | sort by event_type asc
        """,
        """
        WITH f AS (SELECT event_type, ts FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-31'),
        g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS n
              FROM f GROUP BY 1, 2),
        grid AS (SELECT t.event_type, j.i,
                        CAST(coalesce(g.n, 0) AS DOUBLE) AS n
                 FROM (SELECT DISTINCT event_type FROM f) t
                 CROSS JOIN (SELECT unnest(range(0, 30)) AS i) j
                 LEFT JOIN g ON g.event_type = t.event_type
                            AND g.i = j.i),
        s AS (SELECT *, min(n) OVER (PARTITION BY event_type) AS mn_w
              FROM grid)
        SELECT event_type,
               min(n) AS mn,
               min(CASE WHEN n = mn_w THEN i END) AS mni,
               max(n) AS mx,
               CAST(floor(avg(n) * 10000.0 + 0.5) AS BIGINT) AS av,
               CAST(floor(stddev_samp(n) * 10000.0 + 0.5)
                    AS BIGINT) AS sd,
               CAST(floor((CASE WHEN isfinite(regr_slope(n, i))
                                THEN regr_slope(n, i) END)
                          * 10000.0 + 0.5) AS BIGINT) AS slope,
               CAST(floor((CASE WHEN isfinite(regr_intercept(n, i))
                                THEN regr_intercept(n, i) END)
                          * 10000.0 + 0.5) AS BIGINT) AS icpt,
               CAST(floor((CASE WHEN isfinite(regr_r2(n, i))
                                THEN regr_r2(n, i) END)
                          * 10000.0 + 0.5) AS BIGINT) AS rsq
        FROM s GROUP BY event_type ORDER BY event_type
        """,
    ),
    # EXTENSION union kind=inner (common columns only) + withsource
    "pql_union_inner": (
        """
        events
        | project user_id, value
        | union kind=inner withsource=src
            (events | project user_id, event_type)
        | summarize n = count(), u = dcount(user_id) by src
        | sort by src asc
        """,
        """
        SELECT src, count(*) AS n, count(DISTINCT user_id) AS u
        FROM (SELECT user_id, '' AS src FROM events
              UNION ALL SELECT user_id, 'events' FROM events)
        GROUP BY src ORDER BY src
        """,
    ),
    # EXTENSION mv-expand with_itemindex (0-based element position)
    "pql_mv_itemindex": (
        """
        events
        | where value > 300
        | extend arr = pack_array(value, value * 2.0, value * 3.0)
        | mv-expand with_itemindex = idx v = arr
        | project event_id, idx, v = round(v, 4)
        | sort by event_id asc, idx asc
        """,
        """
        SELECT event_id, CAST(j.i AS INT) AS idx,
               round(value * (j.i + 1), 4) AS v
        FROM events CROSS JOIN (SELECT unnest(range(0, 3)) AS i) j
        WHERE value > 300 ORDER BY event_id, j.i
        """,
    ),
    # EXTENSION KQL bitwise function family
    "pql_binary_fns": (
        """
        events
        | where value > 300
        | project event_id,
            a = binary_and(event_id, 255), o = binary_or(event_id, 16),
            x = binary_xor(event_id, 5), n = binary_not(event_id),
            sl = binary_shift_left(event_id, 3),
            sr = binary_shift_right(event_id, 2)
        | sort by event_id asc
        """,
        """
        SELECT event_id,
               event_id & 255 AS a, event_id | 16 AS o,
               xor(event_id, 5) AS x, ~event_id AS n,
               event_id << 3 AS sl, event_id >> 2 AS sr
        FROM events WHERE value > 300 ORDER BY event_id
        """,
    ),
    # EXTENSION materialize() tabular let + evaluate narrow()
    "pql_narrow": (
        """
        let m = materialize(events | where value > 300);
        m
        | project event_id, event_type
        | sort by event_id asc
        | evaluate narrow()
        | sort by Row asc, Column asc
        """,
        """
        WITH f AS (SELECT event_id, event_type,
                          CAST(row_number() OVER (ORDER BY event_id) - 1
                               AS BIGINT) AS r
                   FROM events WHERE value > 300)
        SELECT r AS "Row", c.col AS "Column",
               CASE c.col WHEN 'event_id'
                    THEN CAST(event_id AS VARCHAR)
                    ELSE event_type END AS "Value"
        FROM f CROSS JOIN
             (SELECT unnest(['event_id', 'event_type']) AS col) c
        ORDER BY "Row", "Column"
        """,
    ),
    # EXTENSION KQL IPv4 family + negated string predicates +
    # matches regex (SIEM surface); oracle computes the same masks in
    # DuckDB over the same inline rows
    "pql_ipv4_fns": (
        """
        datatable (id: long, ip: string) [
            1, "10.1.2.3",    2, "172.16.5.1", 3, "172.32.0.1",
            4, "192.168.1.77", 5, "8.8.8.8",   6, "999.1.1.1",
            7, "not-an-ip"
        ]
        | where ip !contains "bogus" and ip matches regex "^[0-9.]+$"
        | project id, pl = parse_ipv4(ip),
            priv = ipv4_is_private(ip),
            inr = ipv4_is_in_range(ip, "10.0.0.0/8"),
            c24 = ipv4_compare(ip, "10.1.2.99", 24),
            fmt = format_ipv4(ip)
        | sort by id asc
        """,
        """
        WITH t(id, ip) AS (VALUES
            (1, '10.1.2.3'), (2, '172.16.5.1'), (3, '172.32.0.1'),
            (4, '192.168.1.77'), (5, '8.8.8.8'), (6, '999.1.1.1'),
            (7, 'not-an-ip')),
        f AS (SELECT * FROM t
              WHERE NOT contains(lower(ip), 'bogus')
                AND regexp_matches(ip, '^[0-9.]+$')),
        p AS (SELECT id, ip, string_split(ip, '.') AS o FROM f),
        v AS (SELECT id, ip,
                     CASE WHEN len(o) = 4
                       AND TRY_CAST(o[1] AS BIGINT) BETWEEN 0 AND 255
                       AND TRY_CAST(o[2] AS BIGINT) BETWEEN 0 AND 255
                       AND TRY_CAST(o[3] AS BIGINT) BETWEEN 0 AND 255
                       AND TRY_CAST(o[4] AS BIGINT) BETWEEN 0 AND 255
                     THEN ((TRY_CAST(o[1] AS BIGINT) * 256
                            + TRY_CAST(o[2] AS BIGINT)) * 256
                           + TRY_CAST(o[3] AS BIGINT)) * 256
                          + TRY_CAST(o[4] AS BIGINT) END AS pl
              FROM p)
        SELECT CAST(id AS BIGINT) AS id, pl,
               (pl // 16777216 = 10 OR pl // 1048576 = 2753
                OR pl // 65536 = 49320) AS priv,
               (pl // 16777216 = 10) AS inr,
               CAST(CASE WHEN pl IS NULL THEN NULL
                    WHEN pl // 256 < 655618 THEN -1
                    WHEN pl // 256 > 655618 THEN 1 ELSE 0 END
                    AS BIGINT) AS c24,
               CASE WHEN pl IS NOT NULL THEN
                 CAST(pl // 16777216 AS VARCHAR) || '.' ||
                 CAST((pl // 65536) % 256 AS VARCHAR) || '.' ||
                 CAST((pl // 256) % 256 AS VARCHAR) || '.' ||
                 CAST(pl % 256 AS VARCHAR) END AS fmt
        FROM v ORDER BY id
        """,
    ),
    # EXTENSION `evaluate ipv4_lookup` (KQL plugin): CIDR-network
    # membership join — the lookup is broadcast and matched via a hash
    # equi-join on (prefix, right-shifted ip) per distinct prefix
    # length, never a nested-loop range probe.  Synthetic ips derive
    # deterministically from user_id; the oracle repeats the identical
    # parse + mask math in DuckDB
    "pql_ipv4_lookup": (
        """
        let nets = datatable (cidr: string, net_name: string) [
            "10.0.0.0/8", "corp", "10.1.5.0/24", "lab",
            "10.0.128.0/17", "dmz", "10.1.7.0/24", "edge",
            "bad/99", "junk"
        ];
        events
        | extend ip = strcat("10.", tostring(user_id % 2), ".",
                             tostring(user_id % 256), ".9")
        | evaluate ipv4_lookup(nets, ip, cidr)
        | summarize hits = count() by net_name
        | sort by net_name asc
        """,
        """
        WITH nets(cidr, net_name) AS (VALUES
            ('10.0.0.0/8', 'corp'), ('10.1.5.0/24', 'lab'),
            ('10.0.128.0/17', 'dmz'), ('10.1.7.0/24', 'edge'),
            ('bad/99', 'junk')),
        np AS (
          SELECT net_name,
                 COALESCE(TRY_CAST(string_split(cidr, '/')[2]
                                   AS BIGINT), 32) AS pfx,
                 (TRY_CAST(string_split(string_split(cidr, '/')[1],
                           '.')[1] AS BIGINT) * 16777216
                  + TRY_CAST(string_split(string_split(cidr, '/')[1],
                             '.')[2] AS BIGINT) * 65536
                  + TRY_CAST(string_split(string_split(cidr, '/')[1],
                             '.')[3] AS BIGINT) * 256
                  + TRY_CAST(string_split(string_split(cidr, '/')[1],
                             '.')[4] AS BIGINT)) AS net
          FROM nets),
        npv AS (SELECT * FROM np
                WHERE net IS NOT NULL AND pfx BETWEEN 0 AND 32),
        e AS (SELECT 167772160 + (user_id % 2) * 65536
                     + (user_id % 256) * 256 + 9 AS ipnum
              FROM events)
        SELECT net_name, count(*) AS hits
        FROM e JOIN npv
          ON CAST(floor(e.ipnum / power(2.0, 32 - npv.pfx)) AS BIGINT)
           = CAST(floor(npv.net / power(2.0, 32 - npv.pfx)) AS BIGINT)
        GROUP BY net_name ORDER BY net_name
        """,
    ),
    # EXTENSION `evaluate ipv6_lookup` (KQL plugin): 128-bit CIDR
    # membership join over the 32-nibble hex canon — same broadcast
    # (prefix, masked-key) equi-join shape as ipv4_lookup.  The fact
    # ips are synthesized so membership is arithmetically decidable;
    # the oracle twins each network's condition directly in DuckDB.
    "pql_ipv6_lookup": (
        """
        let nets = datatable (cidr: string, net_name: string) [
            "2001:db8::/32", "doc", "2001:db8:0::/48", "site0",
            "2001:db8:1::/48", "site1", "2001:db8:2::1", "host",
            "bad/999", "junk"
        ];
        events
        | extend ip = strcat("2001:db8:", tostring(user_id % 4), "::",
                             tostring((user_id % 7) + 1))
        | evaluate ipv6_lookup(nets, ip, cidr)
        | summarize hits = count() by net_name
        | sort by net_name asc
        """,
        """
        WITH e AS (SELECT user_id % 4 AS x, (user_id % 7) + 1 AS y
                   FROM events),
        u AS (
          SELECT 'doc' AS net_name, count(*) AS hits FROM e
          UNION ALL SELECT 'site0', count(*) FROM e WHERE x = 0
          UNION ALL SELECT 'site1', count(*) FROM e WHERE x = 1
          UNION ALL SELECT 'host', count(*) FROM e
            WHERE x = 2 AND y = 1)
        SELECT net_name, hits FROM u WHERE hits > 0 ORDER BY net_name
        """,
    ),
    # EXTENSION `evaluate sliding_window_counts` (KQL plugin): rolling
    # count + distinct-count per bin over a trailing lookback — each
    # row explodes to its ≤ lookback/bin bins, ONE groupBy; the oracle
    # repeats the identical bin math with generate_series in DuckDB
    "pql_sliding_window_counts": (
        """
        events
        | evaluate sliding_window_counts(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 7d, 1d)
        | sort by ts asc
        """,
        """
        WITH b AS (
          SELECT user_id, epoch_us(ts) AS t,
                 epoch_us(TIMESTAMP '2024-01-01') AS s,
                 epoch_us(TIMESTAMP '2024-02-01') AS e,
                 604800000000 AS lw, 86400000000 AS bw
          FROM events),
        k AS (
          SELECT user_id, s, bw,
                 greatest(0, CAST(floor((t - s + bw - 1)
                                        / CAST(bw AS DOUBLE))
                                  AS BIGINT)) AS k0,
                 least(CAST(floor((e - s) / CAST(bw AS DOUBLE))
                            AS BIGINT),
                       CAST(floor((t + lw - s + bw - 1)
                                  / CAST(bw AS DOUBLE)) AS BIGINT) - 1
                 ) AS k1
          FROM b),
        x AS (
          SELECT user_id, make_timestamp(s + u.k * bw) AS ts
          FROM k, unnest(generate_series(k.k0, k.k1)) AS u(k)
          WHERE k.k0 <= k.k1)
        SELECT ts, count(*) AS Count,
               count(DISTINCT user_id) AS Dcount
        FROM x GROUP BY ts ORDER BY ts
        """,
    ),
    # EXTENSION `evaluate activity_counts_metrics` (KQL plugin): per-bin
    # count / distinct / first-seen-new / cumulative-distinct — the
    # retention metric set; two parallel aggregates + a bin-level
    # running sum, twinned exactly in DuckDB
    "pql_activity_metrics": (
        """
        events
        | evaluate activity_counts_metrics(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 1d)
        | sort by ts asc
        """,
        """
        WITH b AS (
          SELECT user_id,
                 epoch_us(TIMESTAMP '2024-01-01')
                 + CAST(floor((epoch_us(ts)
                               - epoch_us(TIMESTAMP '2024-01-01'))
                              / CAST(86400000000 AS DOUBLE)) AS BIGINT)
                   * 86400000000 AS bin
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        per_bin AS (
          SELECT bin, count(*) AS count_,
                 count(DISTINCT user_id) AS dcount
          FROM b GROUP BY bin),
        firsts AS (
          SELECT user_id, min(bin) AS bin FROM b GROUP BY user_id),
        new_bin AS (
          SELECT bin, count(*) AS new_dcount FROM firsts GROUP BY bin)
        SELECT make_timestamp(p.bin) AS ts, p.count_, p.dcount,
               coalesce(n.new_dcount, 0) AS new_dcount,
               CAST(sum(coalesce(n.new_dcount, 0)) OVER (
                 ORDER BY p.bin ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS aggregated_dcount
        FROM per_bin p LEFT JOIN new_bin n ON p.bin = n.bin
        ORDER BY ts
        """,
    ),
    # EXTENSION make-graph / graph-match (simplified KQL graph
    # operators): fixed-length path patterns as hash equi-joins —
    # co-engagement pairs via a forward + reverse edge sharing the
    # middle node; plain-join twin in DuckDB
    "pql_graph_match": (
        """
        let g = events
            | where user_id < 40
            | summarize weight = count() by user_id, event_type;
        g
        | make-graph user_id --> event_type
        | graph-match (u)-[e1]->(t)<-[e2]-(v)
            where u.id < v.id and e1.weight >= 3 and e2.weight >= 3
            project u = u.id, v = v.id, t = t.id
        | summarize shared = count() by u, v
        | sort by u asc, v asc
        """,
        """
        WITH g AS (SELECT user_id, event_type, count(*) AS weight
                   FROM events WHERE user_id < 40 GROUP BY 1, 2)
        SELECT a.user_id AS u, b.user_id AS v, count(*) AS shared
        FROM g a JOIN g b ON a.event_type = b.event_type
        WHERE a.user_id < b.user_id
          AND a.weight >= 3 AND b.weight >= 3
        GROUP BY 1, 2 ORDER BY u, v
        """,
    ),
    # EXTENSION `evaluate new_activity_metrics` (simplified KQL plugin):
    # cohort-retention matrix — first-seen cohorts × activity bins,
    # returning dcount + retention ratio; identical join shape in DuckDB
    "pql_new_activity": (
        """
        events
        | evaluate new_activity_metrics(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 7d)
        | extend retention = tolong(floor(
              retention * 1000000.0 + 0.5))
        | sort by cohort_ts asc, ts asc
        """,
        """
        WITH a AS (
          SELECT DISTINCT user_id,
                 epoch_us(TIMESTAMP '2024-01-01')
                 + CAST(floor((epoch_us(ts)
                               - epoch_us(TIMESTAMP '2024-01-01'))
                              / CAST(604800000000 AS DOUBLE)) AS BIGINT)
                   * 604800000000 AS bin
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        f AS (SELECT user_id, min(bin) AS cohort FROM a
              GROUP BY user_id),
        sizes AS (SELECT cohort, count(*) AS csize FROM f
                  GROUP BY cohort),
        cells AS (
          SELECT f.cohort, a.bin, count(*) AS dcount
          FROM a JOIN f ON a.user_id = f.user_id
          GROUP BY f.cohort, a.bin)
        SELECT make_timestamp(c.cohort) AS cohort_ts,
               make_timestamp(c.bin) AS ts, c.dcount,
               CAST(floor(CAST(c.dcount AS DOUBLE)
                          / CAST(s.csize AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT) AS retention
        FROM cells c JOIN sizes s ON c.cohort = s.cohort
        ORDER BY cohort_ts, ts
        """,
    ),
    # EXTENSION `evaluate funnel_sequence` (simplified KQL plugin):
    # (prev, next) state transitions around a step — per-id lag/lead
    # window + one groupBy; identical window twin in DuckDB
    "pql_funnel_sequence": (
        """
        events
        | evaluate funnel_sequence(user_id, ts, datetime(2024-01-01),
            datetime(2024-02-01), 12h, "click", event_type)
        | extend prev = coalesce(prev, "(none)"),
                 next = coalesce(next, "(none)")
        | sort by prev asc, next asc
        """,
        """
        WITH b AS (
          SELECT user_id AS id, event_type AS state,
                 epoch_us(ts) AS t
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        m AS (
          SELECT id, state,
                 CASE WHEN t - lag(t) OVER
                        (PARTITION BY id ORDER BY t) <= 43200000000
                   THEN lag(state) OVER (PARTITION BY id ORDER BY t)
                 END AS prev,
                 CASE WHEN lead(t) OVER
                        (PARTITION BY id ORDER BY t) - t <= 43200000000
                   THEN lead(state) OVER (PARTITION BY id ORDER BY t)
                 END AS next
          FROM b)
        SELECT coalesce(prev, '(none)') AS prev,
               coalesce(next, '(none)') AS next,
               count(DISTINCT id) AS dcount
        FROM m WHERE state = 'click'
        GROUP BY 1, 2 ORDER BY prev, next
        """,
    ),
    # EXTENSION `evaluate active_users_count` (simplified KQL plugin):
    # engaged ids per bin (active in ≥ MinActivePeriods distinct
    # trailing periods) — distinct (id, period) first, bounded explode,
    # two groupBys; identical generate_series math in DuckDB
    "pql_active_users_count": (
        """
        events
        | evaluate active_users_count(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 1d, 7, 3)
        | sort by ts asc
        """,
        """
        WITH a AS (
          SELECT DISTINCT user_id AS id,
                 CAST(floor((epoch_us(ts)
                             - epoch_us(TIMESTAMP '2024-01-01'))
                            / 86400000000.0) AS BIGINT) AS p
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        e AS (SELECT id, kk.k AS k
              FROM a, unnest(generate_series(p, least(p + 6, 30)))
                   AS kk(k)),
        g AS (SELECT k, id FROM e GROUP BY k, id
              HAVING count(*) >= 3)
        SELECT make_timestamp(epoch_us(TIMESTAMP '2024-01-01')
                              + k * 86400000000) AS ts,
               CAST(count(*) AS BIGINT) AS active_users
        FROM g GROUP BY k ORDER BY ts
        """,
    ),
    # EXTENSION `evaluate activity_engagement` (KQL plugin): per-bin
    # DAU/MAU stickiness — bounded explode to the outer windows each
    # row participates in, one (bin,id) flag dedup, one conditional
    # count; identical generate_series math in DuckDB
    "pql_activity_engagement": (
        """
        events
        | evaluate activity_engagement(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 1d, 7d)
        | sort by ts asc
        """,
        """
        WITH b AS (
          SELECT user_id AS id,
                 epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS u
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        e AS (
          SELECT id, kk.k AS k,
                 CAST(floor(u / 86400000000.0) AS BIGINT) AS kin
          FROM b, unnest(generate_series(
               greatest(0, CAST(floor((u - 86400000000)
                                      / 86400000000.0) AS BIGINT) + 1),
               least(30, CAST(floor((u + 604800000000 - 86400000000)
                                    / 86400000000.0) AS BIGINT))
             )) AS kk(k)),
        p AS (SELECT k, id,
                     max(CASE WHEN kin = k THEN 1 ELSE 0 END) AS inn
              FROM e GROUP BY k, id)
        SELECT make_timestamp(epoch_us(TIMESTAMP '2024-01-01')
                              + k * 86400000000) AS ts,
               CAST(sum(inn) AS BIGINT) AS dcount_activities_inner,
               CAST(count(*) AS BIGINT) AS dcount_activities_outer,
               CAST(sum(inn) AS DOUBLE) / count(*) AS activity_ratio
        FROM p GROUP BY k ORDER BY ts
        """,
    ),
    # EXTENSION `evaluate funnel_completion` (simplified KQL
    # funnel_sequence_completion): greedy-earliest anchored chains per
    # id, counted per (step, max-window) — k−1 keyed min-aggregations
    # + one conditional-count aggregate; identical chain CTEs in DuckDB
    "pql_funnel_completion": (
        """
        events
        | evaluate funnel_completion(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), event_type,
            ("view", "click", "purchase"), (1h, 1d, 7d))
        | sort by step asc, period asc
        """,
        """
        WITH b AS (
          SELECT user_id AS id, event_type AS state, epoch_us(ts) AS t
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        c1 AS (SELECT id, min(t) AS t1 FROM b
               WHERE state = 'view' GROUP BY id),
        c2 AS (SELECT b.id, c1.t1, min(b.t) AS tj
               FROM b JOIN c1 ON b.id = c1.id
               WHERE b.state = 'click' AND b.t >= c1.t1
               GROUP BY b.id, c1.t1),
        c3 AS (SELECT b.id, c2.t1, min(b.t) AS tj
               FROM b JOIN c2 ON b.id = c2.id
               WHERE b.state = 'purchase' AND b.t >= c2.tj
               GROUP BY b.id, c2.t1),
        s AS (
          SELECT 1 AS step, 'view' AS state, 0::BIGINT AS span FROM c1
          UNION ALL SELECT 2, 'click', tj - t1 FROM c2
          UNION ALL SELECT 3, 'purchase', tj - t1 FROM c3),
        w AS (SELECT unnest([3600000000, 86400000000,
                             604800000000]) AS period)
        SELECT s.step, s.state, w.period,
               CAST(count(CASE WHEN s.span <= w.period THEN 1 END)
                    AS BIGINT) AS dcount
        FROM s CROSS JOIN w
        GROUP BY 1, 2, 3 ORDER BY step, period
        """,
    ),
    # EXTENSION `evaluate session_count` (KQL plugin): sessions started
    # per bin (no activity within the lookback opens a session) — one
    # distinct, one per-id lag window, one groupBy; identical window
    # twin in DuckDB
    "pql_session_count": (
        """
        events
        | evaluate session_count(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), 1d, 2d)
        | sort by ts asc
        """,
        """
        WITH a AS (
          SELECT DISTINCT user_id,
                 CAST(floor((epoch_us(ts)
                             - epoch_us(TIMESTAMP '2024-01-01'))
                            / CAST(86400000000 AS DOUBLE)) AS BIGINT)
                   AS k
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01'
            AND ts < TIMESTAMP '2024-02-01'),
        s AS (
          SELECT k,
                 CASE WHEN lag(k) OVER (PARTITION BY user_id
                                        ORDER BY k) IS NULL
                      OR (k - lag(k) OVER (PARTITION BY user_id
                                           ORDER BY k)) * 86400000000
                         > 172800000000
                 THEN 1 ELSE 0 END AS new_s
          FROM a)
        SELECT make_timestamp(epoch_us(TIMESTAMP '2024-01-01')
                              + k * 86400000000) AS ts,
               count(*) AS count_
        FROM s WHERE new_s = 1 GROUP BY k ORDER BY ts
        """,
    ),
    # EXTENSION `evaluate rolling_percentile` (KQL plugin): per-bin
    # exact interpolated percentile over the trailing N bins — same
    # explode-to-bins + one groupBy shape; quantile_cont twin
    "pql_rolling_percentile": (
        """
        events
        | evaluate rolling_percentile(value, 75, ts, 1d, 7)
        | sort by ts asc
        """,
        """
        WITH b AS (
          SELECT value,
                 CAST(floor(epoch_us(ts) / CAST(86400000000 AS DOUBLE))
                      AS BIGINT) AS b0
          FROM events),
        x AS (
          SELECT value, make_timestamp(u.k * 86400000000) AS ts
          FROM b, unnest(generate_series(b.b0, b.b0 + 6)) AS u(k))
        SELECT ts, quantile_cont(value, 0.75) AS percentile_value_75
        FROM x GROUP BY ts ORDER BY ts
        """,
    ),
    # EXTENSION `evaluate rows_near` (KQL plugin): context rows around
    # matches — ONE bounded-frame window max per partition, no
    # self-join; oracle is the identical window in DuckDB
    "pql_rows_near": (
        """
        events
        | where user_id < 50
        | sort by user_id asc, ts asc, event_id asc
        | serialize by user_id
        | evaluate rows_near(event_type == "purchase", 1)
        | project user_id, event_id, event_type
        | sort by user_id asc, event_id asc
        """,
        """
        WITH e AS (SELECT user_id, event_id, event_type, ts
                   FROM events WHERE user_id < 50),
        k AS (SELECT user_id, event_id, event_type,
                     MAX(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id
                       ORDER BY user_id, ts, event_id
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                     ) AS keep
              FROM e)
        SELECT user_id, event_id, event_type FROM k WHERE keep = 1
        ORDER BY user_id, event_id
        """,
    ),
    # EXTENSION KQL array/set function family — constant inputs via
    # datatable, array outputs flattened to delimiter digests (driver
    # outputs must be scalar); expected values verified against both
    # backends and hand-checked semantics
    "pql_array_set_fns": (
        """
        datatable (id: long) [1]
        | extend u = set_union(pack_array(1,2), pack_array(2,3),
                               pack_array(4)),
                 i = set_intersect(pack_array(1,2,3), pack_array(2,3,4)),
                 d = set_difference(pack_array(1,2,3,4), pack_array(2),
                                    pack_array(4,5)),
                 rl = array_rotate_left(pack_array(1,2,3,4,5), 2),
                 sl = array_shift_left(pack_array(1,2,3,4,5), 2),
                 sr = array_shift_right(pack_array(1,2,3,4,5), 2, -1),
                 ai = array_iff(pack_array(true, false, true),
                                pack_array(1,2,3), pack_array(10,20,30))
        | project id,
            h = set_has_element(pack_array(1,2), 2),
            u_s = strcat_delim(",", u[1], u[2], u[3], u[4]),
            i_s = strcat_delim(",", i[1], i[2]),
            d_s = strcat_delim(",", d[1], d[2]),
            rl_s = strcat_delim(",", rl[1], rl[2], rl[3], rl[4], rl[5]),
            sl3 = sl[3], sl4 = sl[4],
            sr_s = strcat_delim(",", sr[1], sr[2], sr[3]),
            ai_s = strcat_delim(",", ai[1], ai[2], ai[3])
        """,
        """
        SELECT CAST(1 AS BIGINT) AS id, TRUE AS h,
               '1,2,3,4' AS u_s, '2,3' AS i_s, '1,3' AS d_s,
               '3,4,5,1,2' AS rl_s,
               CAST(5 AS INT) AS sl3, CAST(NULL AS INT) AS sl4,
               '-1,-1,1' AS sr_s, '1,20,3' AS ai_s
        """,
    ),
    # EXTENSION top-nested `with others =` bucket
    "pql_top_nested_others": (
        """
        events
        | top-nested 3 of event_type with others = "OTHER"
            by n = count()
        | sort by event_type asc
        """,
        """
        WITH g AS (SELECT event_type, count(*) AS n
                   FROM events GROUP BY event_type),
        r AS (SELECT *, row_number() OVER
                          (ORDER BY n DESC, event_type) AS rn FROM g),
        b AS (SELECT CASE WHEN rn <= 3 THEN event_type
                     ELSE 'OTHER' END AS event_type, n FROM r)
        SELECT event_type, CAST(sum(n) AS BIGINT) AS n
        FROM b GROUP BY event_type ORDER BY event_type
        """,
    ),
    # EXTENSION stored let-functions (inlined, typed params)
    "pql_let_fn": (
        """
        let tier = (v: real) { case(v < 100.0, "low",
                                    v < 250.0, "mid", "high") };
        let pair = (a: string, b: string) { strcat(a, ":", b) };
        events
        | summarize n = count()
            by k = pair(event_type, tier(value))
        | sort by k asc
        """,
        """
        SELECT event_type || ':' ||
               CASE WHEN value < 100.0 THEN 'low'
                    WHEN value < 250.0 THEN 'mid'
                    ELSE 'high' END AS k,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY k
        """,
    ),
    # EXTENSION round-4 scalar batch: max_of/min_of, bin_at,
    # format_bytes, datetime_part, week_of_year, translate, sha256,
    # regex countof, parse_version — all Catalyst-native
    "pql_scalar_fns2": (
        """
        events
        | where value > 300
        | project event_id,
            mx = max_of(value, 400.0), mn = min_of(value, 400.0),
            b = bin_at(value, 50, 10),
            fb = format_bytes(value * 1024, 1),
            hr = datetime_part("hour", ts),
            wk = week_of_year(ts),
            tr = translate("aeiou", "AEIOU", event_type),
            h = hash_sha256(event_type),
            co = countof(event_type, "[aeiou]", "regex"),
            pv = parse_version(strcat(tostring(event_id % 5), ".",
                                      tostring(event_id % 7)))
        | sort by event_id asc
        """,
        """
        SELECT event_id,
               greatest(value, 400.0) AS mx, least(value, 400.0) AS mn,
               CAST(floor((value - 10) / 50) AS BIGINT) * 50 + 10 AS b,
               CAST(round(value * 1024 / 1024.0, 1) AS VARCHAR)
                   || ' KB' AS fb,
               CAST(date_part('hour', ts) AS BIGINT) AS hr,
               CAST(weekofyear(ts) AS BIGINT) AS wk,
               translate(event_type, 'aeiou', 'AEIOU') AS tr,
               sha256(event_type) AS h,
               CAST(len(regexp_extract_all(event_type, '[aeiou]'))
                    AS BIGINT) AS co,
               concat_ws('.',
                   lpad(CAST(event_id % 5 AS VARCHAR), 8, '0'),
                   lpad(CAST(event_id % 7 AS VARCHAR), 8, '0'),
                   '00000000', '00000000') AS pv
        FROM events WHERE value > 300 ORDER BY event_id
        """,
    ),
    # EXTENSION element-wise series math + vector helpers over real
    # embedding arrays (the ANN/embedding-pipeline scalar toolkit)
    "pql_series_vector": (
        """
        embeddings
        | where vec_id < 200
        | project vec_id,
            dot = series_dot_product(embedding, embedding),
            mag = series_magnitude(embedding),
            sadd = series_sum(series_add(embedding, embedding)),
            mxa = series_max(series_abs(embedding)),
            nneg = series_sum(series_less(embedding,
                series_subtract(embedding, embedding)))
        | sort by vec_id asc
        """,
        """
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding,
                     x -> CAST(x AS DOUBLE)) AS a
          FROM embeddings WHERE vec_id < 200
        )
        SELECT vec_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a, x -> x * x)),
                   (acc, x) -> acc + x) AS dot,
               sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a, x -> x * x)),
                   (acc, x) -> acc + x)) AS mag,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a, x -> x + x)),
                   (acc, x) -> acc + x) AS sadd,
               list_max(list_transform(a, x -> abs(x))) AS mxa,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(a,
                       x -> CAST(x < x - x AS DOUBLE))),
                   (acc, x) -> acc + x) AS nneg
        FROM e ORDER BY vec_id
        """,
    ),
    # EXTENSION `find in (…) where …` multi-table source (desugars to
    # extend-provenance + outer union + filter — both backends free)
    "pql_find_op": (
        """
        find in (customer, supplier)
            where c_nationkey == 3 or s_nationkey == 3
            project source_, c_name, s_name
        | sort by source_ asc, c_name asc, s_name asc
        """,
        """
        WITH u AS (
          SELECT 'customer' AS source_, c_name,
                 CAST(NULL AS VARCHAR) AS s_name,
                 c_nationkey, CAST(NULL AS INTEGER) AS s_nationkey
          FROM customer
          UNION ALL
          SELECT 'supplier', NULL, s_name, NULL, s_nationkey
          FROM supplier)
        SELECT source_, c_name, s_name FROM u
        WHERE coalesce(c_nationkey = 3, FALSE)
           OR coalesce(s_nationkey = 3, FALSE)
        ORDER BY source_, c_name NULLS FIRST, s_name NULLS FIRST
        """,
    ),
    # EXTENSION `reduce by` wildcard-pattern clustering
    "pql_reduce_op": (
        """
        events
        | reduce by strcat(event_type, " u", tostring(user_id),
                           " ", props)
        | sort by Count desc, Pattern asc
        | take 20
        """,
        """
        WITH v AS (
          SELECT event_type || ' u' || CAST(user_id AS VARCHAR)
                 || ' ' || props AS val
          FROM events),
        p AS (
          SELECT regexp_replace(regexp_replace(val,
                     '[0-9A-Fa-f]{8,}', '*', 'g'),
                     '[0-9]+', '*', 'g') AS "Pattern",
                 val FROM v)
        SELECT "Pattern", count(*) AS "Count",
               min(val) AS "Representative"
        FROM p GROUP BY "Pattern"
        ORDER BY "Count" DESC, "Pattern" LIMIT 20
        """,
    ),
    # EXTENSION `evaluate sequence_detect` — distributed greedy
    # forward-asof funnel chains (view → click → purchase per user)
    "pql_sequence_detect": (
        """
        events
        | evaluate sequence_detect(ts, 1d, 2d,
            v = event_type == "view",
            c = event_type == "click",
            p = event_type == "purchase"
            by user_id)
        | sort by user_id asc, v_ts asc, c_ts asc, p_ts asc
        """,
        """
        WITH base AS (SELECT user_id, ts, event_type FROM events),
        s1 AS (SELECT user_id, ts AS t0 FROM base
               WHERE event_type = 'view'),
        u2 AS (
          SELECT user_id, ts AS u_ts, 1 AS ev,
                 CAST(NULL AS TIMESTAMP) AS t0
          FROM base WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, t0, 0, t0 FROM s1),
        c2 AS (
          SELECT user_id, ev, t0,
                 min(CASE WHEN ev = 1 THEN u_ts END) OVER (
                   PARTITION BY user_id
                   ORDER BY u_ts DESC, ev ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS t1
          FROM u2),
        p2 AS (SELECT user_id, t0, t1 FROM c2
               WHERE ev = 0 AND t1 IS NOT NULL
                 AND epoch_us(t1) <= epoch_us(t0) + 86400000000),
        u3 AS (
          SELECT user_id, ts AS u_ts, 1 AS ev,
                 CAST(NULL AS TIMESTAMP) AS t0,
                 CAST(NULL AS TIMESTAMP) AS t1
          FROM base WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, t1, 0, t0, t1 FROM p2),
        c3 AS (
          SELECT user_id, ev, t0, t1,
                 min(CASE WHEN ev = 1 THEN u_ts END) OVER (
                   PARTITION BY user_id
                   ORDER BY u_ts DESC, ev ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS t2
          FROM u3),
        p3 AS (SELECT user_id, t0, t1, t2 FROM c3
               WHERE ev = 0 AND t2 IS NOT NULL
                 AND epoch_us(t2) <= epoch_us(t1) + 86400000000
                 AND epoch_us(t2) <= epoch_us(t0) + 172800000000)
        SELECT user_id, t0 AS v_ts, t1 AS c_ts, t2 AS p_ts
        FROM p3 ORDER BY user_id, v_ts, c_ts, p_ts
        """,
    ),
    # EXTENSION `invoke` + tabular-bodied let-function (KQL view)
    "pql_invoke_op": (
        """
        let hot = (src: (*), thr: real) {
            src
            | where value >= thr
            | summarize n = count(),
                        avg_v = tolong(floor(avg(value) * 100.0 + 0.5))
                by event_type };
        events | invoke hot(300.0) | sort by event_type asc
        """,
        """
        SELECT event_type, count(*) AS n,
               CAST(floor(avg(value) * 100.0 + 0.5) AS BIGINT) AS avg_v
        FROM events WHERE value >= 300.0
        GROUP BY event_type ORDER BY event_type
        """,
    ),
    # EXTENSION `evaluate autocluster` — segment mining via native
    # CUBE grouping sets (one shuffle; percent from the cube's own
    # all-wildcard row, no extra scan)
    "pql_autocluster": (
        """
        events
        | extend vb = iff(value >= 250.0, "high", "low")
        | evaluate autocluster(15, event_type, vb)
        """,
        """
        WITH e AS (
          SELECT event_type,
                 CASE WHEN coalesce(value >= 250.0, FALSE)
                      THEN 'high' ELSE 'low' END AS vb
          FROM events),
        c AS (
          SELECT count(*) AS "SegmentCount",
                 CAST(GROUPING(event_type) AS INT)
                 + CAST(GROUPING(vb) AS INT) AS gsum,
                 CASE WHEN GROUPING(event_type) = 1 THEN '*'
                      ELSE coalesce(CAST(event_type AS VARCHAR),
                                    '(null)') END AS event_type,
                 CASE WHEN GROUPING(vb) = 1 THEN '*'
                      ELSE coalesce(CAST(vb AS VARCHAR), '(null)')
                 END AS vb
          FROM e GROUP BY CUBE (event_type, vb)),
        p AS (
          SELECT "SegmentCount",
                 round("SegmentCount" * 100.0 /
                       max(CASE WHEN gsum = 2 THEN "SegmentCount" END)
                       OVER (), 2) AS "Percent",
                 gsum, event_type, vb
          FROM c)
        SELECT "SegmentCount", "Percent", event_type, vb FROM p
        WHERE gsum < 2 AND "Percent" >= 15.0
        ORDER BY "SegmentCount" DESC, event_type, vb
        """,
    ),
    # EXTENSION `evaluate diffpatterns` (simplified KQL): cohort-diff
    # segment mining — one CUBE, two conditional counts, window totals
    # off the all-wildcard row; identical CUBE twin in DuckDB (counts
    # CAST from DuckDB's HUGEINT sums)
    "pql_diffpatterns": (
        """
        events
        | extend coh = iff(user_id % 2 == 0, "A", "B"),
                 vb = iff(value >= 250.0, "high", "low")
        | evaluate diffpatterns(coh, "A", "B", 0.05, event_type, vb)
        | sort by event_type asc, vb asc
        """,
        """
        WITH e AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                     AS coh,
                 event_type,
                 CASE WHEN coalesce(value >= 250.0, FALSE)
                      THEN 'high' ELSE 'low' END AS vb
          FROM events),
        c AS (
          SELECT sum(CASE WHEN coh = 'A' THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN coh = 'B' THEN 1 ELSE 0 END) AS cb,
                 CAST(GROUPING(event_type) AS INT)
                 + CAST(GROUPING(vb) AS INT) AS gsum,
                 CASE WHEN GROUPING(event_type) = 1 THEN '*'
                      ELSE coalesce(CAST(event_type AS VARCHAR),
                                    '(null)') END AS event_type,
                 CASE WHEN GROUPING(vb) = 1 THEN '*'
                      ELSE coalesce(CAST(vb AS VARCHAR), '(null)')
                 END AS vb
          FROM e GROUP BY CUBE (event_type, vb)),
        p AS (
          SELECT ca, cb,
                 round(ca * 100.0 / greatest(
                   max(CASE WHEN gsum = 2 THEN ca END) OVER (), 1),
                   2) AS pa,
                 round(cb * 100.0 / greatest(
                   max(CASE WHEN gsum = 2 THEN cb END) OVER (), 1),
                   2) AS pb,
                 gsum, event_type, vb
          FROM c)
        SELECT CAST(ca AS BIGINT) AS CountA,
               CAST(cb AS BIGINT) AS CountB,
               pa AS PercentA, pb AS PercentB,
               round(abs(pa - pb), 2) AS PercentDiff,
               event_type, vb
        FROM p WHERE gsum < 2 AND round(abs(pa - pb), 2) >= 0.05
        ORDER BY event_type, vb
        """,
    ),
    # EXTENSION `evaluate diffpatterns_text` (simplified KQL): token
    # cohort diff over documents — one explode + one token groupBy,
    # cohort totals broadcast back; DuckDB twin with the same
    # normalization (HUGEINT sums CAST)
    "pql_diffpatterns_text": (
        """
        documents
        | evaluate diffpatterns_text(lang, "en", "de", text, 2)
        | sort by token asc
        """,
        r"""
        WITH base AS (
          SELECT CAST(lang = 'en' AS INT) AS a,
                 CAST(lang = 'de' AS INT) AS b,
                 list_distinct(string_split(trim(regexp_replace(
                     lower(text), '\s+', ' ', 'g')), ' ')) AS toks
          FROM documents WHERE lang IN ('en', 'de')),
        tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM base),
        tok AS (SELECT t.token, sum(a) AS ca, sum(b) AS cb
                FROM base, unnest(toks) AS t(token)
                WHERE t.token != '' GROUP BY t.token),
        p AS (SELECT token, ca, cb,
                round(ca * 100.0 / greatest(ta, 1), 2) AS pa,
                round(cb * 100.0 / greatest(tb, 1), 2) AS pb
              FROM tok, tot)
        SELECT token, CAST(ca AS BIGINT) AS CountA,
               CAST(cb AS BIGINT) AS CountB,
               pa AS PercentA, pb AS PercentB,
               round(abs(pa - pb), 2) AS PercentDiff
        FROM p WHERE round(abs(pa - pb), 2) >= 2
        ORDER BY token
        """,
    ),
    # EXTENSION series_fir + series_seasonal over make-series arrays
    # EXTENSION series_fft: DFT energy checked via the Parseval
    # identity — Σ|X[k]|² = n·Σx², which the oracle computes directly
    # from the counts (an error in the DFT fold breaks the identity;
    # coefficient VALUES are pinned against numpy in tests/test_series_fft)
    "pql_series_fft": (
        """
        events
        | make-series n = count() default = 0.0
            on ts from "2024-01-01" to "2024-01-17" step "1d"
            by event_type
        | extend f = series_fft(n)
        | project event_type,
            energy = round(series_sum(series_add(
                series_multiply(f.real, f.real),
                series_multiply(f.imag, f.imag))), 2),
            dc = round(f.real[1], 2)
        | sort by event_type asc
        """,
        """
        WITH g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS c
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-01'
                AND ts < TIMESTAMP '2024-01-17'
              GROUP BY 1, 2),
        m AS (SELECT event_type,
                     map_from_entries(list(row(i, c))) AS mn
              FROM g GROUP BY event_type),
        s AS (SELECT event_type,
                     [CAST(coalesce(mn[j][1], 0) AS DOUBLE)
                      FOR j IN range(0, 16)] AS n
              FROM m)
        SELECT event_type,
               round(16 * list_sum([x * x FOR x IN n]), 2) AS energy,
               round(list_sum(n), 2) AS dc
        FROM s ORDER BY event_type
        """,
    ),
    "pql_series_fir": (
        """
        events
        | make-series n = count() default = 0
            on ts from "2024-01-01" to "2024-01-31" step "1d"
            by event_type
        | extend f = series_fir(n, pack_array(1, 2, 1)),
                 s = series_seasonal(n, 7)
        | project event_type,
            fsum = tolong(floor(series_sum(f) * 10000.0 + 0.5)),
            ssum = tolong(floor(series_sum(s) * 10000.0 + 0.5)),
            f2 = tolong(floor(f[2] * 10000.0 + 0.5)),
            s9 = tolong(floor(s[9] * 10000.0 + 0.5))
        | sort by event_type asc
        """,
        """
        WITH g AS (SELECT event_type,
                     CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
                                / 86400000000) AS BIGINT) AS i,
                     count(*) AS c
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-01'
                AND ts < TIMESTAMP '2024-01-31'
              GROUP BY 1, 2),
        m AS (SELECT event_type,
                     map_from_entries(list(row(i, c))) AS mn
              FROM g GROUP BY event_type),
        s AS (SELECT event_type,
                     [CAST(coalesce(mn[j][1], 0) AS DOUBLE)
                      FOR j IN range(0, 30)] AS n
              FROM m),
        x AS (SELECT event_type, n,
                     [CASE WHEN i = 1 THEN n[1]
                           WHEN i = 2
                             THEN (2 * n[1] + 1 * n[2]) / 3.0
                           ELSE (1 * n[i - 2] + 2 * n[i - 1]
                                 + 1 * n[i]) / 4.0 END
                      FOR i IN range(1, 31)] AS f,
                     [list_avg([n[j] FOR j IN range(1, 31)
                                IF (j - 1) % 7 = (i - 1) % 7])
                      FOR i IN range(1, 31)] AS sn
              FROM s)
        SELECT event_type,
               CAST(floor(list_sum(f) * 10000.0 + 0.5)
                    AS BIGINT) AS fsum,
               CAST(floor(list_sum(sn) * 10000.0 + 0.5)
                    AS BIGINT) AS ssum,
               CAST(floor(f[2] * 10000.0 + 0.5) AS BIGINT) AS f2,
               CAST(floor(sn[9] * 10000.0 + 0.5) AS BIGINT) AS s9
        FROM x ORDER BY event_type
        """,
    ),
    # EXTENSION series_periods_detect over a synthetic sinusoid (range
    # source → make-series → detect → mv-expand): the true period (6)
    # must win with score 42/48 = 0.875 (truncated-lag autocorrelation
    # of a full-period signal), harmonic 12 second at 36/48 = 0.75
    "pql_series_periods": (
        """
        range i from 0 to 47 step 1
        | extend v = sin(2.0 * pi() * todouble(i) / 6.0) + 1.0
        | make-series s = avg(v) on i from 0 to 48 step 1
        | extend d = series_periods_detect(s, 2, 12, 2)
        | mv-expand p = d.periods to typeof(long),
                    sc = d.scores to typeof(double)
        | project p, sc
        """,
        """
        SELECT * FROM (VALUES (CAST(6 AS BIGINT), 0.875),
                              (CAST(12 AS BIGINT), 0.75)) t(p, sc)
        """,
    ),
    # Spark 4 approx_top_k sketch through the passthrough registry —
    # the mergeable frequent-items path (no exact groupBy-all shuffle
    # at 100 TB; sketch is exact here because 5 distinct values ≪ the
    # 10k tracked slots, so the DuckDB exact twin matches)
    "pql_approx_topk": (
        """
        events
        | summarize tk = approx_top_k(event_type, 3)
        | mv-expand t = tk
        | project item = tostring(t.item), cnt = t.count
        | sort by cnt desc, item asc
        """,
        """
        SELECT event_type AS item, count(*) AS cnt
        FROM events GROUP BY event_type
        ORDER BY cnt DESC, item LIMIT 3
        """,
    ),
    # timestamp comparison + passthrough date function in a group key
    "pql_events_daily": (
        """
        events
        | where ts >= "2024-01-10"
        | summarize n = count(), avg_val = round(avg(value), 2)
            by day = date_trunc("day", ts)
        | sort by day asc
        """,
        """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
               round(avg(value), 2) AS avg_val
        FROM events
        WHERE ts >= '2024-01-10'
        GROUP BY day ORDER BY day
        """,
    ),
    # geo bucketing (r10): Morton grid cell ids at a fixed level —
    # cells derive from synthesized lon/lat, grouped.  The DuckDB twin
    # re-implements the interleave with a list comprehension; exact
    # powers of two keep every intermediate < 2^53, so the BIGINT ids
    # hash-match across Spark/DuckDB.
    "pql_geo_cell": (
        """
        events
        | extend lon = todouble(user_id % 3600) / 10.0 - 180.0,
                 lat = todouble(event_id % 1700) / 10.0 - 85.0
        | extend cell = geo_point_to_cell(lon, lat, 12)
        | summarize n = count() by cell
        | sort by n desc, cell asc
        | take 25
        """,
        """
        WITH pts AS (
          SELECT CAST(user_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
                 CAST(event_id % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
          FROM events
        ), bins AS (
          SELECT
            LEAST(CAST(pow(2.0, 12) AS BIGINT) - 1,
                  FLOOR((lon + 180.0) / 360.0 * pow(2.0, 12))) AS x,
            LEAST(CAST(pow(2.0, 12) AS BIGINT) - 1,
                  FLOOR((lat + 90.0) / 180.0 * pow(2.0, 12))) AS y
          FROM pts
        ), cells AS (
          SELECT CAST(list_sum([
              ((CAST(FLOOR(x / pow(2.0, i)) AS BIGINT) % 2)
                 * CAST(pow(2.0, 2 * i + 1) AS BIGINT))
            + ((CAST(FLOOR(y / pow(2.0, i)) AS BIGINT) % 2)
                 * CAST(pow(2.0, 2 * i) AS BIGINT))
            for i in range(12)]) AS BIGINT) AS cell
          FROM bins
        )
        SELECT cell, count(*) AS n FROM cells
        GROUP BY cell ORDER BY n DESC, cell ASC LIMIT 25
        """,
    ),
    # geo cell decode (r10): center + re-encode round trip, banded.
    # The oracle re-implements decompact/center/re-encode with DuckDB
    # bit operators — rt_ok == n everywhere IS the round-trip law,
    # checked independently on both engines.
    "pql_geo_center": (
        """
        events
        | extend lon = todouble(user_id % 3600) / 10.0 - 180.0,
                 lat = todouble(event_id % 1700) / 10.0 - 85.0
        | extend cell = geo_point_to_cell(lon, lat, 8)
        | extend ctr = geo_cell_center(cell, 8)
        | extend rt = geo_point_to_cell(ctr.lon, ctr.lat, 8)
        | summarize n = count(), rt_ok = countif(rt == cell)
            by band = bin(ctr.lat, 30.0)
        | sort by band asc
        """,
        """
        WITH pts AS (
          SELECT CAST(user_id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
                 CAST(event_id % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
          FROM events
        ), bins AS (
          SELECT
            LEAST(255, FLOOR((lon + 180.0) / 360.0 * 256.0)) AS x,
            LEAST(255, FLOOR((lat + 90.0) / 180.0 * 256.0)) AS y
          FROM pts
        ), cells AS (
          SELECT CAST(list_sum([
              (((CAST(x AS BIGINT) >> i) & 1) * CAST(pow(2.0, 2 * i + 1) AS BIGINT))
            + (((CAST(y AS BIGINT) >> i) & 1) * CAST(pow(2.0, 2 * i) AS BIGINT))
            for i in range(8)]) AS BIGINT) AS cell
          FROM bins
        ), dec AS (
          SELECT cell,
            CAST(list_sum([((cell >> (2 * i + 1)) & 1) * CAST(pow(2.0, i) AS BIGINT)
                           for i in range(8)]) AS BIGINT) AS dx,
            CAST(list_sum([((cell >> (2 * i)) & 1) * CAST(pow(2.0, i) AS BIGINT)
                           for i in range(8)]) AS BIGINT) AS dy
          FROM cells
        ), ctr AS (
          SELECT cell,
            -180.0 + (CAST(dx AS DOUBLE) + 0.5) * 1.40625 AS clon,
            -90.0 + (CAST(dy AS DOUBLE) + 0.5) * 0.703125 AS clat
          FROM dec
        ), rt AS (
          SELECT cell, clat, CAST(list_sum([
              (((CAST(LEAST(255, FLOOR((clon + 180.0) / 360.0 * 256.0)) AS BIGINT) >> i) & 1)
                 * CAST(pow(2.0, 2 * i + 1) AS BIGINT))
            + (((CAST(LEAST(255, FLOOR((clat + 90.0) / 180.0 * 256.0)) AS BIGINT) >> i) & 1)
                 * CAST(pow(2.0, 2 * i) AS BIGINT))
            for i in range(8)]) AS BIGINT) AS rtc
          FROM ctr
        )
        SELECT FLOOR(clat / 30.0) * 30.0 AS band, count(*) AS n,
               CAST(count(*) FILTER (rtc = cell) AS BIGINT) AS rt_ok
        FROM rt GROUP BY band ORDER BY band ASC
        """,
    ),
}

# ------------------------------------------------------- shared SQL snippets

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"
_DOT = (
    "list_dot_product({a}, {b})"
)


def _shingles_sql(words: str, k: int) -> str:
    """DuckDB expression mirroring operators.text.word_shingles."""
    if k == 1:
        return f"list_distinct({words})"
    return (
        f"CASE WHEN len({words}) <= {k} "
        f"THEN [array_to_string({words}, ' ')] "
        f"ELSE list_distinct([array_to_string(({words})[i:i+{k - 1}], ' ') "
        f"FOR i IN range(1, len({words}) - {k} + 2)]) END"
    )


# Injected-duplicate id offset for gates whose base is the FULL
# (scale-dependent) documents/embeddings table: must clear the id range
# at EVERY scale the gate runs (sf10 documents span 0..499,999; the old
# +100,000 aliased ids 100000..100049 there, so connected_components
# transitively merged unrelated docs through the shared-id vertices —
# ADVICE r12).  1e9 clears any plausible replica count.  Gates that cap
# their base first (doc_id < 1000/500/300 before the union) keep the
# small literal: a capped base cannot collide at any scale.
_DUP_OFF = 1_000_000_000


def _minhash_oracle(num_perm: int = 64, bands: int = 16, k: int = 5,
                    threshold: float = 0.7) -> str:
    """Generated DuckDB SQL mirroring minhash_dup_pairs exactly (same
    md5-derived hashes, same (a,b,P) permutation params, same banding)."""
    rows = num_perm // bands
    params = D._perm_params(num_perm)
    mins = ",\n    ".join(
        f"min(({a} * h + {b}) % {D._P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_structs = ", ".join(
        "struct_pack(band := {i}, bhash := md5(array_to_string([{ms}], ',')))".format(
            i=i,
            ms=", ".join(
                f"m{j}::VARCHAR" for j in range(i * rows, (i + 1) * rows)
            ),
        )
        for i in range(bands)
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFF} AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
docs AS (SELECT doc_id, {_WORDS} AS words FROM base),
sh AS (SELECT doc_id, {_shingles_sql('words', k)} AS sh FROM docs),
grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
hashed AS (SELECT doc_id,
    ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
bands AS (SELECT doc_id, unnest([{band_structs}]) AS bk FROM sig),
b2 AS (SELECT doc_id, bk.band AS band, bk.bhash AS bhash FROM bands),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM b2 a JOIN b2 b
           ON a.band = b.band AND a.bhash = b.bhash
          AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
       len(list_intersect(sa.sh, sb.sh))::DOUBLE
           / len(list_distinct(sa.sh || sb.sh)) AS jaccard
FROM cand
JOIN sh sa ON id_a = sa.doc_id
JOIN sh sb ON id_b = sb.doc_id
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
          / len(list_distinct(sa.sh || sb.sh)) >= {threshold}
ORDER BY id_a, id_b
"""


def _dedup_clusters_oracle() -> str:
    """Recursive-CTE twin: min reachable label per node over the
    symmetrized minhash-pair graph (same pair set as _minhash_oracle,
    embedded as a subquery)."""
    inner = _minhash_oracle().strip()
    return f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({inner}) q),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT a AS id FROM edges),
lab(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.a, l.label FROM edges e JOIN lab l ON l.id = e.b
)
SELECT id, min(label) AS component FROM lab GROUP BY id ORDER BY id
"""


def _ngram_oracle_ppjoin() -> str:
    """sf10 SCALE twin of _NGRAM_ORACLE (VERDICT r12 item 5): the
    naive inverted-index oracle materializes ~2 B (gram, pair) rows at
    sf10 and exceeded a 2400 s cap, proving only an upper bound.  This
    twin applies the standard PPJoin prefix filter (Xiao et al. 2008,
    the same rule the Spark operator uses): order each doc's shingles
    by ascending global document frequency, keep the first
    n - ceil(t·n) + 1 as the prefix; any pair with J ≥ t must share a
    prefix gram, so the prefix equi-join is a LOSSLESS candidate
    generator and the exact list_intersect verify keeps output values
    identical to the naive formulation (same integer n_inter / union
    division, same doubles).  It is cheaper, not weaker: the naive
    inverted join pays one row per (shared gram, pair) — the hot-gram
    quadratic — while this pays one row per candidate PAIR plus one
    bounded list_intersect.  Emitted as a multi-statement TEMP-TABLE
    script, not one WITH query: profiled at sf0.1/sf1, DuckDB's CTE
    planner (plain OR MATERIALIZED) runs the identical stages 4-5×
    slower than staged tables (sf1: 249 s single-query vs 50 s
    staged); ``con.execute`` runs the script and returns the final
    SELECT.  Used by tools/bench_scaling.py for the sf10 decade only;
    the driver's sf0.01 hash gate keeps the naive formulation."""
    return f"""
CREATE OR REPLACE TEMP TABLE pp_sh AS
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFF} AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
docs AS (SELECT doc_id, {_WORDS} AS words FROM base)
SELECT doc_id, {_shingles_sql('words', _NGRAM_K)} AS sh FROM docs;
CREATE OR REPLACE TEMP TABLE pp_sizes AS
SELECT doc_id, len(sh) AS n FROM pp_sh;
CREATE OR REPLACE TEMP TABLE pp_inv AS
SELECT doc_id, unnest(sh) AS gram FROM pp_sh;
CREATE OR REPLACE TEMP TABLE pp_pref AS
SELECT doc_id, gram FROM (
  SELECT i.doc_id, i.gram,
         row_number() OVER (PARTITION BY i.doc_id
                            ORDER BY d.df, i.gram) AS r, s.n
  FROM pp_inv i
  JOIN (SELECT gram, count(*) AS df FROM pp_inv GROUP BY gram) d
    USING (gram)
  JOIN pp_sizes s USING (doc_id)) x
WHERE r <= n - CAST(ceil({_NGRAM_T} * n) AS BIGINT) + 1;
CREATE OR REPLACE TEMP TABLE pp_cand AS
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM pp_pref a JOIN pp_pref b
  ON a.gram = b.gram AND a.doc_id < b.doc_id;
CREATE OR REPLACE TEMP TABLE pp_scored AS
SELECT id_a, id_b,
       len(list_intersect(sha.sh, shb.sh)) AS n_inter,
       sa.n AS na, sb.n AS nb
FROM pp_cand
JOIN pp_sh sha ON id_a = sha.doc_id
JOIN pp_sh shb ON id_b = shb.doc_id
JOIN pp_sizes sa ON id_a = sa.doc_id
JOIN pp_sizes sb ON id_b = sb.doc_id;
SELECT id_a, id_b,
       n_inter::DOUBLE / (na + nb - n_inter) AS jaccard
FROM pp_scored
WHERE n_inter::DOUBLE / (na + nb - n_inter) >= {_NGRAM_T}
ORDER BY id_a, id_b
"""


def _dedup_clusters_oracle_unrolled(rounds: int = 6) -> str:
    """sf10 SCALE twin of _dedup_clusters_oracle (VERDICT r12 item 5):
    the recursive-CTE min-reachable-label enumerates every (node,
    reachable label) pair before aggregating — quadratic in cluster
    size and the reason the sf10 oracle blew a 2400 s cap.  This twin
    runs ``rounds`` UNROLLED min-label propagation steps (the same
    update the Spark operator iterates: label' = min over closed
    neighborhood), each a linear edges⋈labels join, and GUARDS the
    result: if the last round still changed any label the query calls
    error() instead of returning a wrong answer, so a deeper-than-
    expected graph surfaces loudly (near-dup families here are
    complete subgraphs — diameter 1-2; 6 rounds is deep margin).  At a
    stable fixed point every label equals its component minimum, so
    the output is exact, not approximate."""
    inner = _minhash_oracle().strip()
    # every CTE here is referenced more than once; DuckDB inlines
    # plain CTEs, which would expand the chain EXPONENTIALLY (each
    # l{{i}} uses l{{i-1}} twice) — MATERIALIZED keeps it linear
    steps = []
    prev = "l0"
    for i in range(1, rounds + 1):
        steps.append(
            f"l{i} AS MATERIALIZED (SELECT id, min(label) AS label FROM ("
            f"SELECT id, label FROM {prev} "
            f"UNION ALL "
            f"SELECT e.a AS id, p.label FROM edges e "
            f"JOIN {prev} p ON p.id = e.b) GROUP BY id)"
        )
        prev = f"l{i}"
    chain = ",\n".join(steps)
    last, second_last = f"l{rounds}", f"l{rounds - 1}"
    return f"""
WITH pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({inner}) q),
edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
l0 AS MATERIALIZED (
  SELECT a AS id, a AS label FROM (SELECT DISTINCT a FROM edges)),
{chain},
chg AS (SELECT count(*) AS n
        FROM {last} x JOIN {second_last} y USING (id)
        WHERE x.label != y.label)
SELECT id,
       CASE WHEN (SELECT n FROM chg) > 0
            THEN CAST(error('min-label propagation not converged in'
                            ' {rounds} rounds') AS BIGINT)
            ELSE label END AS component
FROM {last} ORDER BY id
"""


def scale_oracle_sql() -> dict[str, str]:
    """Cheaper-but-exact DuckDB twins used ONLY by the sf10 decade of
    tools/bench_scaling.py, for rows whose driver oracle is an
    asymptotically losing formulation there (VERDICT r12 item 5).
    Each produces the same rows/values as the driver oracle (verified
    in-sweep by a value compare against the Spark result) or errors —
    never a silent approximation."""
    return {
        "op_ngram_jaccard": _ngram_oracle_ppjoin(),
        "op_dedup_clusters": _dedup_clusters_oracle_unrolled(),
    }


_QUALITY_STOPS = "['the','and','of','to','a','in','is','that','it','for']"


def _langid_pred_expr(dtoks: str) -> str:
    """lang_pred for a distinct-token list expression — the same
    greatest-of-printf device `_langid_oracle` hash-proved, reused by
    the composed curate twins."""
    cases = []
    for lang in sorted(X.STOPWORDS):
        wl = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS[lang]) + "]"
        score = (
            f"round(len(list_intersect({dtoks}, {wl}))::DOUBLE"
            f" / len(list_distinct({dtoks} || {wl})), 6)"
        )
        cases.append(f"printf('%012.6f|%s', {score}, '{lang}')")
    return f"split_part(greatest({', '.join(cases)}), '|', 2)"


def _curate_ctes(
    min_quality: float,
    threshold: float,
    test_rate: float,
    max_dup_ngram_frac: float | None,
    decontaminate_gram_n: int | None,
    bench_where: str = "doc_id % 97 = 0",
    base_where: str = "",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> str:
    """CTE chain twinning ``pipelines.curate_corpus`` stage by stage
    (every formula is the one its standalone gate hash-proved:
    _QUALITY_ORACLE, _langid_oracle, _REPETITION_ORACLE's
    dup_ngram_frac, _minhash_oracle at 32/8, _DECON_ORACLE,
    _SAMPLING_ORACLE's md5 bucket).  Emits CTEs ``ct0`` (annotated
    input), ``ckq`` (quality/lang filter), ``ckr`` (repetition),
    ``ckd`` (exact dedup), ``ckept`` (post drop-list), ``cfinal``
    (doc_id, lang_pred, fingerprint, split).  ``redact`` needs no twin:
    the gate projects none of the redacted text, and the split keys on
    the PRE-redaction fingerprint."""
    rows = num_perm // bands
    params = D._perm_params(num_perm)
    mins = ",\n    ".join(
        f"min(({a} * h + {b}) % {D._P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_structs = ", ".join(
        "struct_pack(band := {i}, bhash := md5(array_to_string([{ms}], ',')))"
        .format(
            i=i,
            ms=", ".join(
                f"m{j}::VARCHAR" for j in range(i * rows, (i + 1) * rows)
            ),
        )
        for i in range(bands)
    )
    where = f"WHERE {base_where}" if base_where else ""
    quality = (
        f"CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END"
        f" + CASE WHEN len(list_intersect(toks, {_QUALITY_STOPS}))::DOUBLE"
        f" / len(toks) > 0.01 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN len(regexp_extract_all(text, '[^\\w\\s]', 0))::DOUBLE"
        f" / greatest(length(text), 1) < 0.2 THEN 0.25 ELSE 0.0 END"
    )
    if max_dup_ngram_frac is not None:
        rep = f"""
cdc AS (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({_grams_sql('toks', _REP_DUP_N)}) AS g
              FROM ckq)
        GROUP BY doc_id, g),
crep AS (SELECT doc_id,
           CAST(coalesce(sum(c * length(g)) FILTER (WHERE c > 1), 0)
                AS DOUBLE) / sum(c * length(g)) AS dup_ngram_frac
         FROM cdc GROUP BY doc_id),
ckr AS (SELECT ckq.* FROM ckq JOIN crep USING (doc_id)
        WHERE dup_ngram_frac <= {max_dup_ngram_frac}),"""
    else:
        rep = "\nckr AS (SELECT * FROM ckq),"
    if decontaminate_gram_n is not None:
        decon = f"""
cbsh AS (SELECT DISTINCT
           unnest({_shingles_sql('toks', decontaminate_gram_n)}) AS gram
         FROM ct0 WHERE {bench_where}),
ccsh AS (SELECT doc_id,
           unnest({_shingles_sql('toks', decontaminate_gram_n)}) AS gram
         FROM ckd),
ccont AS (SELECT DISTINCT ccsh.doc_id FROM ccsh JOIN cbsh USING (gram)),
cdrops AS (SELECT doc_id FROM cdropn
           UNION SELECT doc_id FROM ccont),"""
    else:
        decon = "\ncdrops AS (SELECT doc_id FROM cdropn),"
    test_cut = int(test_rate * 4294967296)
    return f"""
ct0 AS (SELECT doc_id, text, {_WORDS} AS toks, {_NORM} AS norm
        FROM documents {where}),
cann AS (SELECT doc_id, text, toks,
           {quality} AS quality,
           {_langid_pred_expr('list_distinct(toks)')} AS lang_pred,
           md5(norm) AS fingerprint
         FROM ct0),
ckq AS (SELECT * FROM cann WHERE quality >= {min_quality}),{rep}
ckd AS (SELECT * FROM ckr
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fingerprint)),
csh AS (SELECT doc_id, {_shingles_sql('toks', shingle_k)} AS sh FROM ckd),
cgrams AS (SELECT doc_id, unnest(sh) AS g FROM csh),
chashed AS (SELECT doc_id,
              ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM cgrams),
csig AS (SELECT doc_id, {mins} FROM chashed GROUP BY doc_id),
cbands AS (SELECT doc_id, unnest([{band_structs}]) AS bk FROM csig),
cb2 AS (SELECT doc_id, bk.band AS band, bk.bhash AS bhash FROM cbands),
ccand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM cb2 a JOIN cb2 b
            ON a.band = b.band AND a.bhash = b.bhash
           AND a.doc_id < b.doc_id),
cdropn AS (SELECT DISTINCT id_b AS doc_id FROM ccand
           JOIN csh sa ON id_a = sa.doc_id
           JOIN csh sb ON id_b = sb.doc_id
           WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                 / len(list_distinct(sa.sh || sb.sh)) >= {threshold}),{decon}
ckept AS (SELECT * FROM ckd
          WHERE doc_id NOT IN (SELECT doc_id FROM cdrops)),
cfinal AS (SELECT doc_id, lang_pred, fingerprint,
             CASE WHEN ('0x' || substr(md5('split' || fingerprint), 1, 8))
                       ::BIGINT < {test_cut}
                  THEN 'test' ELSE 'train' END AS split
           FROM ckept)"""


def _curate_corpus_oracle() -> str:
    """Composed twin of the _q_curate_corpus gate: chain of the
    hash-proved stage twins ending in the (doc_id, lang_pred, split)
    survivor set (VERDICT r10 item 3)."""
    ctes = _curate_ctes(
        min_quality=0.5, threshold=0.8, test_rate=0.1,
        max_dup_ngram_frac=0.98, decontaminate_gram_n=13,
    )
    return f"""
WITH{ctes}
SELECT doc_id, lang_pred, split FROM cfinal ORDER BY doc_id
"""


def _curate_qa_oracle() -> str:
    """Composed twin of _q_curate_qa: kept/dropped cohort profile rows
    (count + null count per profiled column) plus per-stage survivor
    counts, over the qa-variant pipeline (no repetition stage, no
    benchmark)."""
    ctes = _curate_ctes(
        min_quality=0.5, threshold=0.8, test_rate=0.1,
        max_dup_ngram_frac=None, decontaminate_gram_n=None,
        base_where="doc_id < 2000",
    )
    prof_cols = ["doc_id", "quality", "text_len"]
    prof = "\nUNION ALL\n".join(
        f"SELECT cohort, '{c}' AS item, count(*) AS n,"
        f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_null FROM clab GROUP BY cohort"
        for c in prof_cols
    )
    stages = [
        ("input", "ct0"), ("quality_lang", "ckq"),
        ("exact_dedup", "ckd"), ("near_dup_decontam", "ckept"),
        ("final", "cfinal"),
    ]
    counts = "\nUNION ALL\n".join(
        f"SELECT 'stage' AS cohort, '{name}' AS item,"
        f" (SELECT count(*) FROM {cte}) AS n, CAST(0 AS BIGINT) AS n_null"
        for name, cte in stages
    )
    return f"""
WITH{ctes},
clab AS (SELECT ct0.doc_id, cann.quality, length(ct0.text) AS text_len,
           CASE WHEN f.doc_id IS NOT NULL THEN 'kept' ELSE 'dropped' END
             AS cohort
         FROM ct0 JOIN cann USING (doc_id)
         LEFT JOIN cfinal f ON ct0.doc_id = f.doc_id)
SELECT cohort, item, n, n_null FROM (
{prof}
UNION ALL
{counts}
) ORDER BY cohort, item
"""


def _langid_oracle() -> str:
    cases = []
    for lang in sorted(X.STOPWORDS):
        wl = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS[lang]) + "]"
        score = (
            f"round(len(list_intersect(toks, {wl}))::DOUBLE"
            f" / len(list_distinct(toks || {wl})), 6)"
        )
        cases.append(f"printf('%012.6f|%s', {score}, '{lang}')")
    return f"""
WITH t AS (SELECT doc_id, list_distinct({_WORDS}) AS toks FROM documents),
s AS (SELECT doc_id, greatest({", ".join(cases)}) AS best FROM t)
SELECT doc_id, split_part(best, '|', 2) AS lang_pred,
       CAST(split_part(best, '|', 1) AS DOUBLE) AS lang_score
FROM s
"""


def _simhash_oracle(bits: int = 64) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_WORDS} AS toks FROM documents),
h AS (SELECT doc_id,
  list_transform(toks,
    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS th FROM t),
b AS (SELECT doc_id,
  [CASE WHEN list_aggregate(list_transform(th,
       x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
        THEN 1 ELSE 0 END FOR j IN range(0, {bits})] AS bits FROM h)
SELECT doc_id, md5(array_to_string(bits, ',')) AS simhash_fp FROM b
"""


_NGRAM_K = 3
_NGRAM_T = 0.6

_NGRAM_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFF} AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
docs AS (SELECT doc_id, {_WORDS} AS words FROM base),
sh AS (SELECT doc_id, {_shingles_sql('words', _NGRAM_K)} AS sh FROM docs),
sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
inv AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM inv a JOIN inv b
            ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       n_inter::DOUBLE / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE n_inter::DOUBLE / (sa.n + sb.n - n_inter) >= {_NGRAM_T}
ORDER BY id_a, id_b
"""

_COSINE_PAIRS_T = 0.35

_COSINE_PAIRS_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
      >= {_COSINE_PAIRS_T}
ORDER BY id_a, id_b
"""

_TOPK_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       list_dot_product(v, qv)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
           AS cosine
FROM v, q
ORDER BY cosine DESC, vec_id ASC
LIMIT 20
"""

# rounding is floor(x/scale + 0.5) in BOTH engines (numpy half-even vs
# SQL half-away makes round() non-portable); all arithmetic is IEEE
# double, so qvec/qscale are bit-identical
_QUANTIZE_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS amax FROM v),
s AS (SELECT vec_id, v,
             CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS qscale
      FROM m)
SELECT vec_id,
       md5(array_to_string(
           list_transform(v, x -> floor(x / qscale + 0.5)::TINYINT), ','))
           AS q_digest,
       qscale
FROM s
"""

_KNN_ORACLE = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
p AS (SELECT a.vec_id AS id, b.vec_id AS neighbor,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      FROM v a JOIN v b
        ON a.label = b.label AND a.vec_id != b.vec_id)
SELECT id, neighbor, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY id
                               ORDER BY cosine DESC, neighbor ASC) AS rank
  FROM p) t
WHERE rank <= 3
ORDER BY id, rank
"""

_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {_WORDS} AS toks FROM documents),
m AS (SELECT doc_id,
  len(toks) AS n_words,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '[^\\w\\s]', 0)) AS n_punct,
  len(list_intersect(toks,
      ['the','and','of','to','a','in','is','that','it','for']))::DOUBLE
      / len(toks) AS stop_ratio,
  list_aggregate(list_transform(toks, t -> length(t)), 'sum')::DOUBLE
      / len(toks) AS mean_word_len
  FROM t)
SELECT doc_id, n_words,
       n_punct::DOUBLE / greatest(n_chars, 1) AS punct_ratio,
       stop_ratio AS stopword_ratio,
       mean_word_len,
       CASE WHEN n_words BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END
           + CASE WHEN stop_ratio > 0.01 THEN 0.25 ELSE 0.0 END
           + CASE WHEN n_punct::DOUBLE / greatest(n_chars, 1) < 0.2
                  THEN 0.25 ELSE 0.0 END AS quality
FROM m
"""

_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len({_WORDS}) AS n_words,
       len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS n_tokens,
       length(text) AS n_chars_measured
FROM documents
"""

_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, {_NORM} AS norm FROM documents)
SELECT doc_id, md5(norm) AS fingerprint,
       md5(array_to_string((string_split(norm, ' '))[1:8], ' ')) AS head_key
FROM t
"""

_DEDUP_EXACT_ORACLE = """
SELECT DISTINCT doc_id, text, lang, source, n_chars FROM documents
"""

# 6-hour tumbling windows; Spark aligns windows to the unix epoch, so the
# oracle reproduces bucketing with integer epoch arithmetic (engine-neutral)
_STREAM_WINDOWED_ORACLE = """
SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600)
            AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600 + 21600)
            AS TIMESTAMP) AS window_end,
       event_type,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
           AS sum_value
FROM events
GROUP BY 1, 2, 3
"""

# session windows (gap 2h): gaps-and-islands; session_end = last event + gap
_STREAM_SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM o
),
s AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 2 HOUR AS session_end,
         count(*) AS n_events,
         round(sum(value), 4) AS total_value
  FROM g GROUP BY user_id, sess_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS sum_events,
       CAST(sum(CAST(total_value AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_value,
       min(session_start) AS first_start,
       max(session_end) AS last_end
FROM s GROUP BY user_id
"""

_STREAM_STATEFUL_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
"""

# deterministic hash sampling + stratified rates + split assignment
# DSIR-style importance weights (hashed-bigram log p_target/p_source
# with Laplace smoothing) — the identical md5 bucket hash + ratio math
# in DuckDB; round(6) absorbs float sum-order noise
_DSIR_ORACLE = """
WITH norm AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                          'g')), ' ') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) <= 2
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+1], ' ')
                 FOR i IN range(1, len(toks) - 2 + 1 + 1)]
         END AS gs
  FROM norm),
b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(g.g), 1, 8))::BIGINT % 10007 AS bucket
  FROM grams, unnest(gs) AS g(g)),
sc AS (SELECT bucket, count(*) AS sc FROM b GROUP BY 1),
tc AS (SELECT bucket, count(*) AS tc FROM b
       WHERE source = 'src0' GROUP BY 1),
m AS (
  SELECT coalesce(sc.bucket, tc.bucket) AS bucket,
         coalesce(sc.sc, 0) AS sc, coalesce(tc.tc, 0) AS tc
  FROM sc FULL JOIN tc ON sc.bucket = tc.bucket),
r AS (
  SELECT bucket,
         ln((tc + 0.5) / ((SELECT sum(tc) FROM m) + 0.5 * 10007))
         - ln((sc + 0.5) / ((SELECT sum(sc) FROM m) + 0.5 * 10007))
           AS ir
  FROM m)
SELECT b.doc_id,
       CAST(floor(sum(r.ir) * 1000000.0 + 0.5) AS BIGINT) AS lw
FROM b JOIN r ON b.bucket = r.bucket
GROUP BY b.doc_id ORDER BY b.doc_id
"""

# domain-weighted token-budget corpus mixing: per-domain keep-rate
# min(1, target/total) with deterministic md5 key-hash selection —
# identical rate math + hash in the oracle (floor() on both sides:
# DuckDB CAST rounds, Spark floors)
_MIX_ORACLE = """
WITH w(domain, wt) AS (VALUES
    ('src0', 6.0), ('src1', 3.0), ('src2', 1.0)),
tot AS (SELECT source AS domain, CAST(SUM(n_chars) AS DOUBLE) AS total
        FROM documents GROUP BY 1),
r AS (SELECT w.domain,
             least(1.0, (12000.0 * wt / 10.0) / total) AS rate
      FROM w JOIN tot ON tot.domain = w.domain)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN r ON d.source = r.domain
WHERE ('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        ::BIGINT
      < CAST(floor(r.rate * 4294967296) AS BIGINT)
ORDER BY d.doc_id
"""

# C4 corpus-level line dedup twin: same synthesized 5-word lines, same
# first-occurrence = min (doc_id, idx) struct rule, ordered reassembly
_LINE_DEDUP_ORACLE = r"""
WITH d AS (SELECT doc_id,
             regexp_replace(text, '((?:\S+ ){4}\S+) ',
                            '\1' || chr(10), 'g') AS text
           FROM documents),
p AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d),
l0 AS (SELECT doc_id,
         unnest([{'i': i - 1, 'ln': parts[i]}
                 FOR i IN range(1, len(parts) + 1)]) AS u
       FROM p),
l AS (SELECT doc_id, u.i AS idx, u.ln AS ln FROM l0),
f AS (SELECT ln, min({'d': doc_id, 'i': idx}) AS first
      FROM l WHERE trim(ln) <> '' GROUP BY ln),
k AS (SELECT l.doc_id, l.idx, l.ln,
        (trim(l.ln) = '' OR
         (l.doc_id = f.first.d AND l.idx = f.first.i)) AS keep
      FROM l LEFT JOIN f USING (ln))
SELECT doc_id,
       string_agg(CASE WHEN keep THEN ln END, chr(10) ORDER BY idx)
           FILTER (WHERE keep) AS text,
       count(*) FILTER (WHERE keep) AS n_lines_kept,
       count(*) FILTER (WHERE NOT keep) AS n_lines_removed
FROM k
GROUP BY doc_id
HAVING count(*) FILTER (WHERE keep) > 0
ORDER BY doc_id
"""

# UniMax water-filling twin: identical sorted-cap prefix-sum closed
# form (budget 140000, max_epochs 1.0 over documents.source/n_chars)
_UNIMAX_ORACLE = """
WITH tot AS (SELECT source AS domain,
                    CAST(SUM(n_chars) AS DOUBLE) AS total_tokens
             FROM documents GROUP BY 1),
c AS (SELECT domain, total_tokens, total_tokens * 1.0 AS cap FROM tot),
r AS (SELECT *,
        ROW_NUMBER() OVER (ORDER BY cap, domain) AS i,
        SUM(cap) OVER (ORDER BY cap, domain
                       ROWS UNBOUNDED PRECEDING) AS pre,
        COUNT(*) OVER () AS L
      FROM c),
k AS (SELECT *,
        MAX(CASE WHEN pre + cap * (L - i) <= 140000.0
                 THEN i ELSE 0 END) OVER () AS kk
      FROM r),
p AS (SELECT *,
        MAX(CASE WHEN i = kk THEN pre END) OVER () AS prek FROM k),
a AS (SELECT domain, total_tokens,
        round(least(cap, coalesce(
          CASE WHEN L > kk
               THEN (140000.0 - coalesce(prek, 0.0)) / (L - kk) END,
          cap)), 4) AS allocation
      FROM p)
SELECT domain, total_tokens, allocation,
       round(allocation / total_tokens, 4) AS epochs
FROM a ORDER BY domain
"""

# unigram-LM scoring twin: same tokenization, same top-500 vocab with
# (count desc, word asc) ties, same factored avg-logprob formula
_LM_SCORE_ORACLE = """
WITH words AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents)
  WHERE w <> ''),
cnt AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS T FROM cnt),
vocab AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT 500)
SELECT words.doc_id,
       COUNT(*) AS n_tokens,
       round(AVG(CASE WHEN vocab.c IS NULL THEN 1.0 ELSE 0.0 END), 4)
           AS oov_frac,
       round(SUM(ln(coalesce(vocab.c, 0) + 1.0)) / COUNT(*)
             - ln(MAX(tot.T) + 500.0), 4) AS avg_logprob
FROM words LEFT JOIN vocab ON words.w = vocab.w CROSS JOIN tot
GROUP BY words.doc_id
ORDER BY words.doc_id
"""

_SAMPLING_ORACLE = """
WITH b AS (SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 AS bucket,
             ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
                 ::BIGINT AS sbucket
           FROM documents)
SELECT doc_id, lang,
       CASE WHEN sbucket < CAST(0.2 * 4294967296 AS BIGINT)
            THEN 'test' ELSE 'train' END AS split
FROM b
WHERE bucket < CASE WHEN lang = 'en'
                    THEN CAST(0.5 * 4294967296 AS BIGINT)
                    ELSE CAST(0.9 * 4294967296 AS BIGINT) END
"""

# winnowing (MOSS) fingerprints, k=5-gram hashes, window w=4; compared
# as a per-doc digest over the sorted selected hashes
_WINNOW_ORACLE = """
WITH t AS (SELECT doc_id, string_split(
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
               AS words FROM documents),
g AS (SELECT doc_id,
        [('0x' || substr(md5(array_to_string(words[i:i+4], ' ')), 1, 8))::BIGINT
         FOR i IN range(1, greatest(len(words) - 5 + 1, 1) + 1)] AS grams
      FROM t),
m AS (SELECT doc_id,
        list_sort(list_distinct(
          [list_min(grams[i:i+3])
           FOR i IN range(1, greatest(len(grams) - 4 + 1, 1) + 1)])) AS fps
      FROM g)
SELECT doc_id, len(fps) AS n_fp,
       md5(array_to_string(fps, ',')) AS fp_digest
FROM m
"""

# KMV distinct sketch: deterministic (md5-ordered), so the approximate
# estimate itself is exactly reproducible by the oracle
_KMV_ORACLE = """
WITH h AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                 AS h
           FROM events),
k AS (SELECT h FROM h ORDER BY h ASC LIMIT 64)
SELECT CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
            ELSE round(63.0 * 4294967296.0 / max(h), 4) END AS estimate,
       max(h) AS kth_min,
       count(*)::INT AS n_sketch
FROM k
"""

def _grams_sql(words: str, n: int) -> str:
    """DuckDB expression mirroring operators.text.word_grams (ALL grams,
    with multiplicity — no list_distinct)."""
    return (
        f"CASE WHEN len({words}) <= {n} "
        f"THEN [array_to_string({words}, ' ')] "
        f"ELSE [array_to_string(({words})[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, len({words}) - {n} + 2)] END"
    )


_REP_TOP_N = 2
_REP_DUP_N = 3

_REPETITION_ORACLE = f"""
WITH lc AS (
  SELECT doc_id, line, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM documents)
  GROUP BY doc_id, line
),
line_stats AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
             / sum(c) AS dup_line_frac,
         CAST(coalesce(sum(c * length(line)) FILTER (WHERE c > 1), 0)
              AS DOUBLE)
             / greatest(sum(c * length(line)), 1) AS dup_line_char_frac
  FROM lc GROUP BY doc_id
),
base AS (SELECT doc_id, length({_NORM}) AS n_chars FROM documents),
tc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_grams_sql(_WORDS, _REP_TOP_N)}) AS g
        FROM documents)
  GROUP BY doc_id, g
),
top_stats AS (
  SELECT doc_id,
         CAST(substr(top, 1, 10) AS BIGINT) AS top_cnt,
         length(top) - 11 AS top_len
  FROM (SELECT doc_id,
               max(lpad(c::VARCHAR, 10, '0') || '|' || g) AS top
        FROM tc GROUP BY doc_id)
),
dc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_grams_sql(_WORDS, _REP_DUP_N)}) AS g
        FROM documents)
  GROUP BY doc_id, g
),
dup_stats AS (
  SELECT doc_id,
         CAST(coalesce(sum(c * length(g)) FILTER (WHERE c > 1), 0)
              AS DOUBLE)
             / sum(c * length(g)) AS dup_ngram_frac
  FROM dc GROUP BY doc_id
)
SELECT base.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       CAST(top_cnt * top_len AS DOUBLE) / greatest(n_chars, 1)
           AS top_ngram_frac,
       dup_ngram_frac
FROM base
JOIN line_stats USING (doc_id)
JOIN top_stats USING (doc_id)
JOIN dup_stats USING (doc_id)
"""


_DECON_N = 5

_DECON_ORACLE = f"""
WITH docs AS (SELECT doc_id, {_WORDS} AS words FROM documents),
sh AS (SELECT doc_id, {_shingles_sql('words', _DECON_N)} AS sh FROM docs),
bench AS (SELECT DISTINCT unnest(sh) AS gram FROM sh
          WHERE doc_id % 17 = 0),
cg AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
hits AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bench USING (gram))
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM hits)
"""


# synthetic PII injected per doc so the scrub has deterministic work
_PII_SUFFIX_SPARK = (
    " mail user{id}@example.com ip 10.0.0.{m} ssn 123-45-6789"
    " card 4111111111111111"
)
_PII_SQL_TEXT = (
    "text || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || ' ssn 123-45-6789 card 4111111111111111'"
)


def _redact_oracle() -> str:
    from pql_spark.operators.text import PII_PATTERNS

    counts = ",\n       ".join(
        f"len(regexp_extract_all(t, '{pat}', 0)) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "t"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH p AS (SELECT doc_id, {_PII_SQL_TEXT} AS t FROM documents)
SELECT doc_id, {red} AS redacted,
       {counts}
FROM p
"""


_CHUNK_SIZE, _CHUNK_OVERLAP = 16, 4
_CHUNK_S = _CHUNK_SIZE - _CHUNK_OVERLAP

_CHUNK_ORACLE = f"""
WITH docs AS (SELECT doc_id, {_WORDS} AS words FROM documents),
c AS (SELECT doc_id, words,
             unnest(range(0,
               greatest(ceil((len(words) - {_CHUNK_SIZE})::DOUBLE
                             / {_CHUNK_S})::INT, 0) + 1)) AS chunk_id
      FROM docs)
SELECT doc_id, chunk_id,
       array_to_string(
         words[chunk_id*{_CHUNK_S}+1 : chunk_id*{_CHUNK_S}+{_CHUNK_SIZE}],
         ' ') AS chunk_text,
       len(words[chunk_id*{_CHUNK_S}+1 : chunk_id*{_CHUNK_S}+{_CHUNK_SIZE}])
           AS n_tokens
FROM c
"""

_PACK_BUDGET, _PACK_SHARDS = 512, 4

_PACK_ORACLE = f"""
WITH t AS (SELECT doc_id,
                  len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS n
           FROM documents),
s AS (SELECT doc_id, n,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % {_PACK_SHARDS} AS INT) AS shard
      FROM t),
w AS (SELECT doc_id, shard, n,
             sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM s)
SELECT doc_id, shard,
       CAST(cum - n AS BIGINT) AS offset,
       CAST(floor((cum - n)::DOUBLE / {_PACK_BUDGET}) AS BIGINT) AS seq
FROM w
"""


# as-of join: every event picks up the most recent signup value <= ts
# for its user (DuckDB's native ASOF JOIN is the oracle)
_ASOF_ORACLE = """
WITH s AS (SELECT user_id, ts, value AS sv FROM events
           WHERE event_type = 'signup'),
j AS (SELECT e.event_id, e.user_id, round(s.sv, 4) AS sv
      FROM events e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.ts >= s.ts)
SELECT user_id,
       count(*) AS n,
       count(sv) AS n_matched,
       CAST(sum(CAST(sv AS DECIMAL(18,4))) AS DOUBLE) AS sum_sv,
       CAST(sum(event_id) AS BIGINT) AS sum_eid
FROM j GROUP BY user_id
"""

# range join: clicks landing inside [purchase, purchase + 2h) windows
# of the same user
_RANGE_JOIN_ORACLE = """
WITH c AS (SELECT user_id, ts, event_id AS click_id FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS lo, ts + INTERVAL 2 HOUR AS hi,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase')
SELECT c.click_id, p.purchase_id
FROM c JOIN p
  ON c.user_id = p.user_id AND p.lo <= c.ts AND c.ts <= p.hi
"""


# ------------------------------------------------------------ query builders


_CAT_CACHE: dict[tuple[int, str], object] = {}


def _cat(spark: SparkSession, sf_dir: str):
    # one resolver per (session, dir): table DataFrames (and their
    # parquet footer probes / schema reads) are built once, not per query
    key = (id(spark), str(sf_dir))
    if key not in _CAT_CACHE:
        _CAT_CACHE[key] = parquet_catalog(spark, sf_dir)
    return _CAT_CACHE[key]


def _pql(
    text: str, backend: str = "auto"
) -> Callable[[SparkSession, str], DataFrame]:
    # backend="auto": the batched SQL compile path (one spark.sql call,
    # ~1 ms Python compile vs ~0.25 s of per-Column py4j chatter —
    # VERDICT r10 item 2), falling back to the DataFrame compiler for
    # the constructs the SQL backend honestly refuses.  Results are
    # bit-identical (backend-equality tests + every gate's DuckDB hash).
    # A few execution-bound gates pin backend="df" where the DataFrame
    # compiler's plan surgery beats the text path at sf1 (see
    # _PQL_BACKEND_PINS).
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return PqlEngine(
            spark, resolver=_cat(spark, sf_dir), backend=backend
        ).query(text)

    return run


# Gates pinned to the DataFrame compiler when its plan measurably
# beats the SQL text path at sf1.  EMPTY as of late r11: the CIDR
# lookups were pinned mid-round (v6 read 14.9 s on the text path),
# but the attribution chased it to TWO emitter fixes — the
# Generate-shape emission for literal-prefix lookups, and a pinned
# REPARTITION(width) passthrough BELOW the parse projections (an
# argless REBALANCE/REPARTITION hint is AQE-coalesced back to the raw
# 1-2 scan splits on small shuffle bytes, which serialized the
# per-row address parse).  With both, the text path now beats the
# DataFrame plan (sf1 best-of-2: v4 1.74 vs 2.85 s, v6 2.76 vs
# 3.68 s, bit-equal).  The mechanism stays for future rows.
_PQL_BACKEND_PINS: dict[str, str] = {}


# multi-output (facet/fork) queries: one gated entry per output table
_FACET_QUERY = """
events
| where value > 10
| facet by event_type with (
    summarize spend = sum(value) by user_id
    | top 5 by spend
  )
"""

_FORK_QUERY = """
events
| fork hot = ( where value > 250 | summarize n = count(), m = max(value) )
       daily = ( summarize n = count() by day = bin(ts, "1 day")
                 | sort by day asc )
"""


def _q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = PqlEngine(spark, resolver=_cat(spark, sf_dir))
    return eng.query(_FACET_QUERY)["event_type"]


def _q_facet_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = PqlEngine(spark, resolver=_cat(spark, sf_dir))
    return eng.query(_FACET_QUERY)["main"]


def _q_fork_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = PqlEngine(spark, resolver=_cat(spark, sf_dir))
    return eng.query(_FORK_QUERY)["hot"]


def _q_fork_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = PqlEngine(spark, resolver=_cat(spark, sf_dir))
    return eng.query(_FORK_QUERY)["daily"]


_FACET_COUNTS_ORACLE = """
SELECT event_type, count(*) AS count_
FROM events WHERE value > 10 GROUP BY event_type
"""

_FACET_MAIN_ORACLE = """
SELECT user_id, sum(value) AS spend
FROM events WHERE value > 10 GROUP BY user_id
ORDER BY spend DESC LIMIT 5
"""

_FORK_HOT_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n, max(value) AS m
FROM events WHERE value > 250
"""

_FORK_DAILY_ORACLE = """
SELECT CAST(to_timestamp(floor(epoch(ts) / 86400) * 86400)
            AS TIMESTAMP) AS day,
       count(*) AS n
FROM events GROUP BY day ORDER BY day
"""


def _q_stream_sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming foreachBatch upsert sink: drain per-user counts into a
    parquet target (one current row per key), read the files back."""
    import shutil
    import tempfile
    from pathlib import Path

    from pql_spark.streaming import (
        stream_parquet_table,
        stream_upsert_to_parquet,
    )

    events = stream_parquet_table(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # tmpfs when present: the upsert swap + checkpoint are many tiny
    # files, all transient for this gate
    shm = Path("/dev/shm")
    root = Path(
        tempfile.mkdtemp(
            prefix="pql_sink_", dir=str(shm) if shm.is_dir() else None
        )
    )
    try:
        stream_upsert_to_parquet(
            agg, str(root / "by_user"), keys=["user_id"],
            checkpoint=str(root / "ckpt"),
        )
        # localCheckpoint materializes JVM-side before the temp dir
        # disappears (no Python Row round-trip)
        out = (
            spark.read.parquet(str(root / "by_user"))
            .orderBy("user_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


_STREAM_SINK_ORACLE = """
SELECT user_id, count(*) AS n FROM events GROUP BY user_id
"""


def _q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH near-dup candidates over a document stream
    (availableNow drain — single batch, so first-seen == min-id and a
    SQL twin can reproduce the buckets exactly)."""
    from pql_spark.streaming import run_available_now_df, stream_near_dup

    # capped input: the gate checks bucket/state semantics, not bulk
    # throughput (BENCH_SCALING covers the batch LSH path at scale)
    base = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") < 1000
    )
    dups = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    docs = base.unionByName(dups)
    import tempfile
    from pathlib import Path

    import shutil

    shm = Path("/dev/shm")
    d = Path(tempfile.mkdtemp(
        prefix="pql_neardup_", dir=str(shm) if shm.is_dir() else None
    ))
    try:
        docs.toPandas().to_parquet(d / "docs.parquet", index=False)
        stream = spark.readStream.schema(docs.schema).parquet(str(d))
        # state_shards sized to the ~1k-doc gate batch (the operator
        # docstring's sizing rule): each (band, shard) group is one
        # python call + state round-trip per batch — shards=1 gives 16
        # groups (one per band), measured 0.4 s under shards=8's 128 at
        # this batch size; buckets are identical for ANY shard count
        out = run_available_now_df(
            stream_near_dup(stream, state_shards=1), "update"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return (
        out.groupBy("doc_id")
        .agg(
            F.min("dup_of").alias("dup_min"),
            F.count(F.lit(1)).alias("nbands"),
        )
        .orderBy("doc_id")
    )


def _stream_near_dup_oracle(num_perm: int = 64, bands: int = 16,
                            k: int = 5) -> str:
    """Bucket twin of the streaming LSH near-dup: same signatures and
    band hashes as _minhash_oracle, flagged = every non-min id per
    occupied bucket."""
    rows = num_perm // bands
    params = D._perm_params(num_perm)
    mins = ",\n    ".join(
        f"min(({a} * h + {b}) % {D._P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_structs = ", ".join(
        "struct_pack(band := {i}, bhash := md5(array_to_string([{ms}], ',')))".format(
            i=i,
            ms=", ".join(
                f"m{j}::VARCHAR" for j in range(i * rows, (i + 1) * rows)
            ),
        )
        for i in range(bands)
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 1000
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
docs AS (SELECT doc_id, {_WORDS} AS words FROM base),
sh AS (SELECT doc_id, {_shingles_sql('words', k)} AS sh FROM docs),
grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
hashed AS (SELECT doc_id,
    ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
bands AS (SELECT doc_id, unnest([{band_structs}]) AS bk FROM sig),
b2 AS (SELECT doc_id, bk.band AS band, bk.bhash AS bhash FROM bands),
kept AS (SELECT doc_id, band, bhash,
                min(doc_id) OVER (PARTITION BY band, bhash) AS keeper
         FROM b2)
SELECT doc_id, min(keeper) AS dup_min,
       CAST(count(*) AS BIGINT) AS nbands
FROM kept WHERE doc_id > keeper
GROUP BY doc_id ORDER BY doc_id
"""


def _q_near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-incremental MinHash-LSH near-dup with PERSISTED parquet
    bucket state (``dedup.near_dup_incremental``, the batch twin of
    ``stream_near_dup``): batch 1 = originals (doc_id < 1000),
    batch 2 = injected near-dups whose ids all exceed batch 1's, so
    the accumulated keeper state equals the single-shot bucket twin
    and ``_stream_near_dup_oracle`` applies verbatim."""
    import shutil
    import tempfile

    base = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") < 1000
    )
    xtra = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    from pathlib import Path

    shm = Path("/dev/shm")
    state_dir = tempfile.mkdtemp(
        prefix="pql_nd_state_", dir=str(shm) if shm.is_dir() else None
    )
    try:
        # localCheckpoint materializes each batch's flags BEFORE the
        # next batch reads the state it appended, and unpins the
        # temp-dir parquet files so cleanup below is safe
        d1 = D.near_dup_incremental(base, state_dir).localCheckpoint()
        d2 = D.near_dup_incremental(xtra, state_dir).localCheckpoint()
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    return (
        d1.unionByName(d2)
        .groupBy("doc_id")
        .agg(
            F.min("dup_of").alias("dup_min"),
            F.count(F.lit(1)).alias("nbands"),
        )
        .orderBy("doc_id")
    )


def _q_curate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-run incremental corpus curation (``streaming.curate_stream``:
    quality filter → file-bus → LSH keeper state → anti-join), run 2
    processing ONLY the newly landed file via checkpointed offsets.
    Run-2 ids all exceed run-1 ids, so surviving ids equal the batch
    twin: kept = quality ≥ 0.75, minus every non-min id per occupied
    band bucket over the kept set."""
    import shutil
    import tempfile
    from pathlib import Path

    from pql_spark.streaming import curate_stream

    base = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") < 1000
    )
    xtra = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    shm = Path("/dev/shm")
    root = Path(
        tempfile.mkdtemp(
            prefix="pql_curate_stream_",
            dir=str(shm) if shm.is_dir() else None,
        )
    )
    try:
        src = root / "src"
        src.mkdir()
        base.toPandas().to_parquet(src / "a.parquet", index=False)
        # state_shards sized to the ~1k-doc gate batches (must match
        # across runs — the persisted keeper state is keyed by shard):
        # shards=1 gives 16 band groups per batch, the same sizing as
        # the stream_near_dup gate; buckets are shard-count-invariant
        curate_stream(
            spark, str(src), str(root / "work"), langs=None,
            state_shards=1,
        )
        xtra.toPandas().to_parquet(src / "b.parquet", index=False)
        kept2 = curate_stream(
            spark, str(src), str(root / "work"), langs=None,
            state_shards=1,
        )
        return (
            kept2.select("doc_id").orderBy("doc_id").localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _curate_stream_oracle(num_perm: int = 64, bands: int = 16,
                          k: int = 5) -> str:
    """Batch twin of the two-run incremental curation: quality filter
    (same formula as _QUALITY_ORACLE), then drop every doc whose band
    bucket holds a lower KEPT id (same signatures/banding as
    _minhash_oracle)."""
    rows = num_perm // bands
    params = D._perm_params(num_perm)
    mins = ",\n    ".join(
        f"min(({a} * h + {b}) % {D._P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_structs = ", ".join(
        "struct_pack(band := {i}, bhash := md5(array_to_string([{ms}], ',')))".format(
            i=i,
            ms=", ".join(
                f"m{j}::VARCHAR" for j in range(i * rows, (i + 1) * rows)
            ),
        )
        for i in range(bands)
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 1000
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
t AS (SELECT doc_id, text, {_WORDS} AS toks FROM base),
m AS (SELECT doc_id,
  len(toks) AS n_words,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '[^\\w\\s]', 0)) AS n_punct,
  len(list_intersect(toks,
      ['the','and','of','to','a','in','is','that','it','for']))::DOUBLE
      / len(toks) AS stop_ratio
  FROM t),
q AS (SELECT doc_id,
  CASE WHEN n_words BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END
      + CASE WHEN stop_ratio > 0.01 THEN 0.25 ELSE 0.0 END
      + CASE WHEN n_punct::DOUBLE / greatest(n_chars, 1) < 0.2
             THEN 0.25 ELSE 0.0 END AS quality
  FROM m),
kept AS (SELECT b.doc_id, b.text FROM base b
         JOIN q ON b.doc_id = q.doc_id WHERE q.quality >= 0.75),
docs AS (SELECT doc_id, {_WORDS} AS words FROM kept),
sh AS (SELECT doc_id, {_shingles_sql('words', k)} AS sh FROM docs),
grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
hashed AS (SELECT doc_id,
    ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
bands AS (SELECT doc_id, unnest([{band_structs}]) AS bk FROM sig),
b2 AS (SELECT doc_id, bk.band AS band, bk.bhash AS bhash FROM bands),
kb AS (SELECT doc_id,
              min(doc_id) OVER (PARTITION BY band, bhash) AS keeper
       FROM b2),
flagged AS (SELECT DISTINCT doc_id FROM kb WHERE doc_id > keeper)
SELECT doc_id FROM kept
WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
ORDER BY doc_id
"""


# series_fit_2lines gate: constant synthetic series (slope change at
# index 12) via datatable; oracle = independent numpy OLS reference
_FIT2_VALS = [round(i + 0.1 * ((i * 7) % 3), 4) for i in range(12)] + [
    round(11 - 1.5 * i + 0.1 * ((i * 5) % 3), 4) for i in range(1, 11)
]


def _q_fit_2lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = ", ".join(repr(v) for v in _FIT2_VALS)
    q = f"""
    datatable (k: long) [1]
    | extend d = series_fit_2lines(pack_array({vals}))
    | mv-expand with_itemindex = i lf = d.line_fit
    | project k, rsq = tolong(floor(d.rsquare * 10000.0 + 0.5)),
              si = d.split_idx,
              v = tolong(floor(d.variance * 10000.0 + 0.5)),
              rv = tolong(floor(d.rvariance * 10000.0 + 0.5)),
              i, lf = tolong(floor(lf * 10000.0 + 0.5))
    | sort by i asc
    """
    return PqlEngine(spark, resolver=_cat(spark, sf_dir)).query(q)


def _fit2_oracle() -> str:
    import numpy as np

    a = np.array(_FIT2_VALS, dtype=np.float64)
    n = len(a)

    def ssres(seg):
        m = len(seg)
        x = np.arange(m, dtype=np.float64)
        sl, ic = np.polyfit(x, seg, 1)
        return float(((seg - (ic + sl * x)) ** 2).sum())

    costs = [ssres(a[:k]) + ssres(a[k:]) for k in range(2, n - 1)]
    k = int(np.argmin(costs)) + 2
    ssr = min(costs)
    sstot = float(((a - a.mean()) ** 2).sum())
    sl1, ic1 = np.polyfit(np.arange(k, dtype=np.float64), a[:k], 1)
    sl2, ic2 = np.polyfit(
        np.arange(n - k, dtype=np.float64), a[k:], 1
    )
    fit = list(ic1 + sl1 * np.arange(k)) + list(
        ic2 + sl2 * np.arange(n - k)
    )
    def iscale(x: float) -> int:
        # identical integer-scaling formula as the Spark query —
        # floor(x * 1e4 + 0.5) round-half-up (driver-hash robust)
        return int(math.floor(float(x) * 10000.0 + 0.5))

    rsq = iscale(1 - ssr / sstot)
    v = iscale(sstot / (n - 1))
    rv = iscale(ssr / (n - 1))
    rows = ", ".join(
        f"(CAST(1 AS BIGINT), CAST({rsq} AS BIGINT),"
        f" CAST({k} AS BIGINT), CAST({v} AS BIGINT),"
        f" CAST({rv} AS BIGINT), CAST({i} AS INT),"
        f" CAST({iscale(float(f))} AS BIGINT))"
        for i, f in enumerate(fit)
    )
    return (
        "SELECT * FROM (VALUES "
        + rows
        + ") AS t(k, rsq, si, v, rv, i, lf) ORDER BY i"
    )


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path: distributed PNG decode (pure-stdlib codec) +
    block-mean featurization over deterministic synthetic PNGs."""
    media = M.synthesize_png_media(spark, n=64)
    feats = M.extract_features(media, dim=16, decoder="png")
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.col("feature")[0].cast("double"), 4).alias("f0"),
        F.round(
            F.expr(
                "aggregate(transform(feature, x -> CAST(x AS DOUBLE)),"
                " 0D, (a, x) -> a + x)"
            ),
            4,
        ).alias("fsum"),
    ).orderBy("media_id")


def _png_decode_oracle() -> str:
    """Driver-side reference: the same synth→encode→decode→featurize
    math run locally (numpy + the stdlib codec), emitted as a VALUES
    table — the distributed kernel must reproduce it exactly."""
    import numpy as np

    from pql_spark.operators._png import decode_png, encode_png
    from pql_spark.operators.multimodal import image_feature, synth_image

    rows = []
    for k in range(64):
        payload = encode_png(synth_image(k))
        feats = [
            float(np.float32(v))
            for v in image_feature(decode_png(payload), 16)
        ]
        rows.append(
            f"(CAST({k} AS BIGINT), CAST({len(payload)} AS BIGINT),"
            f" CAST({round(feats[0], 4)!r} AS DOUBLE),"
            f" CAST({round(sum(feats), 4)!r} AS DOUBLE))"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(media_id, n_bytes, f0, fsum)"
    )


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec path: distributed PCM16 WAV decode (stdlib
    ``wave``) + block-RMS featurization over deterministic synthetic
    WAVs."""
    media = M.synthesize_wav_media(spark, n=64)
    feats = M.extract_features(media, dim=16, decoder="wav")
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.col("feature")[0].cast("double"), 4).alias("f0"),
        F.round(
            F.expr(
                "aggregate(transform(feature, x -> CAST(x AS DOUBLE)),"
                " 0D, (a, x) -> a + x)"
            ),
            4,
        ).alias("fsum"),
    ).orderBy("media_id")


def _wav_decode_oracle() -> str:
    """Driver-side reference: the same synth→encode→decode→featurize
    audio math run locally, emitted as a VALUES table — the
    distributed kernel must reproduce it exactly."""
    import numpy as np

    from pql_spark.operators.multimodal import (
        audio_feature,
        decode_wav,
        encode_wav,
        synth_audio,
    )

    rows = []
    for k in range(64):
        payload = encode_wav(synth_audio(k), 8000)
        samples, sr = decode_wav(payload)
        feats = [
            float(np.float32(v))
            for v in audio_feature(samples, sr, 16)
        ]
        rows.append(
            f"(CAST({k} AS BIGINT), CAST({len(payload)} AS BIGINT),"
            f" CAST({round(feats[0], 4)!r} AS DOUBLE),"
            f" CAST({round(sum(feats), 4)!r} AS DOUBLE))"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(media_id, n_bytes, f0, fsum)"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cat(spark, sf_dir)("documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cat(spark, sf_dir)("embeddings")


def _q_minhash(
    spark: SparkSession, sf_dir: str, sort_pairs: bool = True
) -> DataFrame:
    base = _docs(spark, sf_dir).select("doc_id", "text")
    # inject deterministic near-duplicates so the detector has real work
    # (offset clears the id range at every scale — see _DUP_OFF)
    dups = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + _DUP_OFF).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    return D.minhash_dup_pairs(
        base.unionByName(dups), num_perm=64, bands=16, shingle_k=5,
        threshold=0.7, sort_pairs=sort_pairs,
    )


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: minhash pairs → distributed
    min-label connected components (one join+groupBy-min round per
    diameter step, lineage truncated per round)."""
    # pair order is irrelevant to CC — skip the producer's global
    # sort (guide §2.4); the declared output keeps its own orderBy
    pairs = _q_minhash(spark, sf_dir, sort_pairs=False)
    return D.connected_components(pairs).orderBy("id")


def _q_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs(spark, sf_dir).select("doc_id", "text")
    dups = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + _DUP_OFF).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    return D.ngram_jaccard_pairs(
        base.unionByName(dups), shingle_k=_NGRAM_K, threshold=_NGRAM_T
    )


def _q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_dup_pairs(
        _emb(spark, sf_dir), threshold=_COSINE_PAIRS_T
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    return S.cosine_topk(emb, qv, k=20)


# Measured-recall bounds asserted INSIDE the ANN gates (VERDICT r10
# item 5): the gate output filters on the measured recall column, so a
# quality regression empties the result and the driver's row count
# flags it.  Bounds sit below the measured values at sf0.01 AND sf0.1
# (deterministic data + deterministic hyperplanes/centroids make the
# numbers exact per scale, not statistical).
_LSH_RECALL_BOUND = 0.85  # measured 0.9 at sf0.01 and sf0.1
_IVF_RECALL_BOUND = 0.85  # measured 0.9 (sf0.01) / 1.0 (sf0.1)
_SD_RECALL_BOUND = 0.95   # measured 1.0 at both scales


def _emb_clones(
    spark: SparkSession, emb: DataFrame,
    n_src: int = 1, copies: int = 8, eps: float = 0.001,
) -> DataFrame:
    """Deterministic near-clone injection for the ANN gates (the
    _q_minhash clone pattern lifted to embeddings): ``copies`` clones
    of each of the first ``n_src`` vectors, ids _DUP_OFF+i, coordinate j
    perturbed by ``((i*7 + j) % 5 - 2) * eps`` — integer arithmetic
    times an exact double literal, so a DuckDB twin reproduces every
    vector bit-for-bit."""
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    src = base.filter(F.col("vec_id") < n_src).select(
        F.col("vec_id").alias("__src"), F.col("embedding").alias("qv")
    )
    clones = (
        spark.range(n_src * copies)
        .withColumn("__src", F.col("id") % n_src)
        .join(F.broadcast(src), "__src")
        .select(
            (F.col("id") + _DUP_OFF).alias("vec_id"),
            F.transform(
                "qv",
                lambda x, j: x
                + ((F.col("id") * 7 + j.cast("long")) % 5 - 2)
                .cast("double") * F.lit(eps),
            ).alias("embedding"),
            F.lit(0).alias("label"),
        )
    )
    return base.unionByName(clones)


def _with_recall_at_k(
    approx: DataFrame, exact: DataFrame, k: int, bound: float
) -> DataFrame:
    """Append the measured recall@k vs the brute-force top-k on the
    same corpus (|approx ∩ exact| / k) as a column, and assert the
    documented bound in the query itself."""
    recall = (
        approx.select("vec_id")
        .join(exact.select("vec_id"), "vec_id", "left_semi")
        .agg((F.count(F.lit(1)) / F.lit(float(k))).alias("recall_at_k"))
    )
    return approx.crossJoin(F.broadcast(recall)).filter(
        F.col("recall_at_k") >= F.lit(bound)
    )


def _q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k with 8 planted near-clones of the query
    vector, plus a measured recall_at_k column vs the exact top-10.
    Hash-checked: the seeded hyperplanes are deterministic constants,
    so the whole probe (buckets, 1-bit ring, cosine top-k, recall) has
    an exact DuckDB twin (_lsh_topk_oracle)."""
    emb = _emb_clones(spark, _emb(spark, sf_dir))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    approx = S.lsh_bucket_topk(emb, qv, k=10, planes=8, probe_hamming=1)
    exact = S.cosine_topk(emb, qv, k=10)
    return _with_recall_at_k(approx, exact, 10, _LSH_RECALL_BOUND)


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k + measured recall_at_k vs brute force, asserted ≥ the
    documented bound in-query.  Hash-checked (r11): the centroid
    training is bounded + deterministic, so _ivf_topk_oracle() replays
    it from the pinned sf0.01 corpus and inlines the trained centroids
    and probe cells as SQL literals."""
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    approx = S.ivf_topk(emb, qv, k=10, n_centroids=8, nprobe=3)
    exact = S.cosine_topk(emb, qv, k=10)
    return _with_recall_at_k(approx, exact, 10, _IVF_RECALL_BOUND)


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style dedup over a corpus with 16 planted near-dup
    clones (2 per source vector), plus measured drop_precision /
    drop_recall columns vs the exact brute-force pair graph
    (embedding_dup_pairs → dedup_by_pairs), asserted in-query:
    precision must be exactly 1 (within-cell cosines are exact, so an
    approx-dropped id is always brute-droppable) and recall ≥ the
    documented bound (cross-cell dups are missed BY DESIGN).
    Hash-checked (r11): _semantic_dedup_oracle() replays only the
    bounded centroid training; DuckDB computes clones, cells, both
    pair graphs, components, and the quality columns itself."""
    from pql_spark.operators import semantic_dedup

    # the cloned corpus feeds five consumers below, but it is a cheap
    # narrow construction — persisting it was MEASURED SLOWER at sf0.1
    # (5.8→7.2 s: cache blocks per-branch column pruning), so each
    # branch recomputes the narrow lineage
    emb = _emb_clones(spark, _emb(spark, sf_dir), n_src=8, copies=2,
                      eps=0.0001)
    kept = semantic_dedup(
        emb, threshold=0.9, n_clusters=8
    ).select("vec_id")
    pairs = D.embedding_dup_pairs(emb, threshold=0.9, sort_pairs=False)
    brute_kept = D.dedup_by_pairs(emb, pairs, "vec_id").select("vec_id")
    ids = emb.select("vec_id")
    dropped = ids.join(kept, "vec_id", "left_anti")
    brute_dropped = ids.join(brute_kept, "vec_id", "left_anti")
    stats = (
        dropped.join(brute_dropped, "vec_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("__ni"))
        .crossJoin(F.broadcast(
            dropped.agg(F.count(F.lit(1)).alias("__nd"))))
        .crossJoin(F.broadcast(
            brute_dropped.agg(F.count(F.lit(1)).alias("__nb"))))
        .select(
            F.coalesce(F.col("__ni") / F.col("__nd"), F.lit(1.0))
            .alias("drop_precision"),
            F.coalesce(F.col("__ni") / F.col("__nb"), F.lit(1.0))
            .alias("drop_recall"),
        )
    )
    return (
        kept.crossJoin(F.broadcast(stats))
        .filter(
            (F.col("drop_precision") >= 1.0)
            & (F.col("drop_recall") >= F.lit(_SD_RECALL_BOUND))
        )
        .orderBy("vec_id")
    )


# Bare-operator twins of the three quality-instrumented gates
# (VERDICT r11 item 2): the instrumented gates run operator PLUS an
# in-query brute-force oracle, so their BENCH rows cannot isolate an
# operator regression (the r10→r11 1.63→6.89 s semantic_dedup jump was
# oracle machinery).  These rows run ONLY the operator — same corpus,
# same parameters — and are the round-over-round tracking surface.


def _q_lsh_topk_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k, operator only (no recall column)."""
    emb = _emb_clones(spark, _emb(spark, sf_dir))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    return S.lsh_bucket_topk(emb, qv, k=10, planes=8, probe_hamming=1)


def _q_ivf_topk_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k, operator only (no recall column)."""
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    return S.ivf_topk(emb, qv, k=10, n_centroids=8, nprobe=3)


def _q_semantic_dedup_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keeper set, operator only (no precision/recall)."""
    from pql_spark.operators import semantic_dedup

    emb = _emb_clones(spark, _emb(spark, sf_dir), n_src=8, copies=2,
                      eps=0.0001)
    return semantic_dedup(
        emb, threshold=0.9, n_clusters=8
    ).select("vec_id").orderBy("vec_id")


def _semantic_circle_pts() -> list[tuple[int, list[float]]]:
    """The rotation-degenerate circle (tests/test_semantic_passes.py):
    60 unit vectors, every adjacent pair a planted duplicate
    (cos(2pi/60)=0.9945 >= 0.99; second neighbours 0.978 stay out).
    Uniform on the circle means the 5-cell spherical-k-means optimum
    is rotation-degenerate, so ANY partition must split exactly 5 of
    the 60 adjacent pairs — the cross-cell miss the ``passes`` knob
    exists to recover."""
    import math as _m

    return [
        (i, [_m.cos(2 * _m.pi * i / 60), _m.sin(2 * _m.pi * i / 60)])
        for i in range(60)
    ]


def _q_semantic_passes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 cross-cell recall knob, driver-hash-checked: run
    semantic_dedup_pairs at passes=1 and passes=2 on the circle
    construction and emit one measured row per setting — planted-pair
    recall (want 55/60 then 60/60) and false-pair count (want 0, 0 —
    precision is exact cosines).  The DuckDB twin replays the
    deterministic spherical-k-means for both rotated inits in numpy,
    inlines points + per-pass centroids as literals, and recomputes
    the argmax assignment (ties to the HIGHEST cell, matching
    ivf_assign's array_max), the within-cell exact-cosine pairs, the
    pass union, and the aggregates — so the hash compare covers the
    whole knob, not just the operator's plumbing."""
    from pql_spark.operators.dedup import semantic_dedup_pairs

    circle = spark.createDataFrame(
        _semantic_circle_pts(), "vec_id long, embedding array<double>"
    )
    planted = (F.col("id_b") - F.col("id_a") == 1) | (
        (F.col("id_a") == 0) & (F.col("id_b") == 59)
    )
    out = None
    for p in (1, 2):
        row = (
            semantic_dedup_pairs(
                circle, threshold=0.99, n_clusters=5, sample_size=60,
                passes=p,
            )
            .agg(
                F.count("*").alias("n_pairs"),
                F.sum(planted.cast("long")).alias("n_planted"),
            )
            .select(
                F.lit(p).cast("long").alias("passes"),
                F.col("n_pairs"),
                F.col("n_planted"),
                (F.col("n_pairs") - F.col("n_planted")).alias("extras"),
                F.round(F.col("n_planted") / 60.0, 4).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("passes")


def _semantic_passes_oracle() -> str:
    """Replayed twin of _q_semantic_passes (see its docstring)."""
    import numpy as np

    pts = _semantic_circle_pts()
    x = np.array([v for _, v in pts], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    def train(init_frac: float) -> list[list[float]]:
        n, k = len(x), 5
        idx = (
            np.linspace(0, n - 1, k).astype(int) + int(init_frac * n)
        ) % n
        cents = x[idx].copy()
        for _ in range(10):
            assign = (x @ cents.T).argmax(axis=1)
            for j in range(k):
                members = x[assign == j]
                if len(members):
                    c = members.sum(axis=0)
                    nrm = np.linalg.norm(c)
                    if nrm > 1e-12:
                        cents[j] = c / nrm
        return [[float(v) for v in row] for row in cents]

    pts_sql = ", ".join(
        f"({i}, {v[0]!r}, {v[1]!r})" for i, v in pts
    )
    cents_sql = ", ".join(
        f"({p}, {j}, {c[0]!r}, {c[1]!r})"
        for p, frac in ((0, 0.0), (1, 0.25))
        for j, c in enumerate(train(frac))
    )
    return f"""
WITH pts(vec_id, e0, e1) AS (VALUES {pts_sql}),
cents(p, cell, c0, c1) AS (VALUES {cents_sql}),
asg AS (
  SELECT vec_id, p, cell FROM (
    SELECT pt.vec_id, c.p, c.cell,
           row_number() OVER (
             PARTITION BY pt.vec_id, c.p
             ORDER BY (pt.e0*c.c0 + pt.e1*c.c1)
                      / (sqrt(pt.e0*pt.e0 + pt.e1*pt.e1)
                         * sqrt(c.c0*c.c0 + c.c1*c.c1)) DESC,
                      c.cell DESC) AS rn
    FROM pts pt CROSS JOIN cents c) WHERE rn = 1),
pairs AS (
  SELECT a.p, a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a
  JOIN asg b ON a.p = b.p AND a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN pts pa ON pa.vec_id = a.vec_id
  JOIN pts pb ON pb.vec_id = b.vec_id
  WHERE (pa.e0*pb.e0 + pa.e1*pb.e1)
        / (sqrt(pa.e0*pa.e0 + pa.e1*pa.e1)
           * sqrt(pb.e0*pb.e0 + pb.e1*pb.e1)) >= 0.99),
p1 AS (SELECT DISTINCT id_a, id_b FROM pairs WHERE p = 0),
pu AS (SELECT DISTINCT id_a, id_b FROM pairs),
stats AS (
  SELECT 1 AS passes, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(coalesce(sum(CASE WHEN id_b - id_a = 1
                       OR (id_a = 0 AND id_b = 59)
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_planted
  FROM p1
  UNION ALL
  SELECT 2, CAST(count(*) AS BIGINT),
         CAST(coalesce(sum(CASE WHEN id_b - id_a = 1
                       OR (id_a = 0 AND id_b = 59)
                  THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM pu)
SELECT CAST(passes AS BIGINT) AS passes, n_pairs, n_planted,
       n_pairs - n_planted AS extras,
       round(n_planted / 60.0, 4) AS recall
FROM stats ORDER BY passes
"""


def _ivf_topk_oracle(bare: bool = False) -> str:
    """Replayed-twin oracle for IVF top-k (the BPE device applied to
    the other data-trained structure): the spherical-k-means training
    is a bounded deterministic driver-side computation over the FIRST
    2048 vectors in id order, so the twin replays it in numpy from the
    sf0.01 parquet (the gate contract pins the correctness scale),
    inlines the trained centroids + probe cells as SQL literals, and
    mirrors the Spark plan's cell argmax (struct-max — ties pick the
    HIGHEST cell, matching ivf_assign's array_max), candidate cosine
    top-k, and recall column bit-for-bit.  ``bare=True`` stops at the
    operator output (the _q_ivf_topk_bare twin, no recall column)."""
    import math as _m

    import duckdb as _dd
    import numpy as np

    rows = _dd.sql(
        "SELECT vec_id, embedding FROM"
        " '/root/testdata/sf0.01/embeddings.parquet'"
        " ORDER BY vec_id LIMIT 2048"
    ).fetchall()
    x = np.array([[float(v) for v in r[1]] for r in rows],
                 dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n_centroids, iters = 8, 10
    cents = x[np.linspace(0, len(x) - 1, n_centroids).astype(int)].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c = members.sum(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 1e-12:
                    cents[j] = c / nrm
    cents = [[float(v) for v in row] for row in cents]
    qv = [float(v) for v in rows[0][1]]  # vec_id = 0 is first in order
    qn = _m.sqrt(sum(v * v for v in qv)) or 1.0

    def score(c: list[float]) -> float:
        cn = _m.sqrt(sum(v * v for v in c)) or 1.0
        return sum(a * b for a, b in zip(qv, c)) / (qn * cn)

    order = sorted(range(n_centroids), key=lambda i: (-score(cents[i]), i))
    probes = order[:3]
    cell_structs = ", ".join(
        "struct_pack(s := list_dot_product(v, [{c}])"
        " / (sqrt(list_dot_product(v, v)) * {nc}), c := {i})".format(
            c=", ".join(repr(val) for val in cent),
            nc=repr(_m.sqrt(sum(val * val for val in cent)) or 1.0),
            i=i,
        )
        for i, cent in enumerate(cents)
    )
    qlit = ", ".join(repr(v) for v in qv)
    cos = (
        f"list_dot_product(v, [{qlit}])"
        f" / (sqrt(list_dot_product(v, v)) * {repr(qn)})"
    )
    head = f"""
WITH iv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
icell AS (SELECT vec_id, v,
            (list_max([{cell_structs}])).c AS cell FROM iv),
iapprox AS (SELECT vec_id, {cos} AS cosine FROM icell
            WHERE cell IN ({", ".join(str(p) for p in probes)})
            ORDER BY cosine DESC, vec_id ASC LIMIT 10)"""
    if bare:  # operator-only twin of _q_ivf_topk_bare
        return head + "\nSELECT vec_id, cosine FROM iapprox\n"
    return head + f""",
iexact AS (SELECT vec_id FROM (
             SELECT vec_id, {cos} AS c2 FROM iv
             ORDER BY c2 DESC, vec_id ASC LIMIT 10)),
irecall AS (SELECT count(*) / 10.0 AS recall_at_k
            FROM iapprox JOIN iexact USING (vec_id))
SELECT vec_id, cosine, recall_at_k FROM iapprox, irecall
WHERE recall_at_k >= {_IVF_RECALL_BOUND}
"""


def _gif_dups_oracle() -> str:
    """Replayed-twin oracle for the GIF pHash near-dup gate — the PNG
    discipline: GIF is LOSSLESS for palettized content, so the twin
    hashes the synth pixels directly (never touching the codec) and
    any LZW/container corruption breaks the match; pairs are
    brute-forced, re-proving the banded join lossless on real output
    each round.  Corpus constant → data-independent VALUES literal."""
    import numpy as np

    from pql_spark.operators.multimodal import (
        phash_reference,
        synth_image_palettized,
    )

    hashes: dict[int, list[int]] = {
        k: phash_reference(synth_image_palettized(k)) for k in range(64)
    }
    for k in range(6):
        img = np.clip(
            synth_image_palettized(k).astype(np.int64) + 6, 0, 255
        ).astype(np.uint8)
        hashes[100000 + k] = phash_reference(img)
    ids = sorted(hashes)
    pairs = [
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (h := sum(x != y for x, y in zip(hashes[a], hashes[b]))) <= 6
    ]
    rows = ", ".join(f"({a}, {b}, {h})" for a, b, h in pairs)
    return f"""
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(hamming AS INTEGER) AS hamming
FROM (VALUES {rows}) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b
"""


def _jpeg_dups_oracle() -> str:
    """Replayed-twin oracle for the JPEG pHash near-dup gate.  Checked
    independently of the OPERATOR: the twin re-decodes each constant
    payload sequentially driver-side (JPEG is lossy, so unlike the
    PNG/AVI twins it cannot hash the synth pixels — decode parity and
    the entropy layer's bit-exactness are instead pinned by
    tests/test_jpeg.py) and brute-forces ALL pairs, so the distributed
    Arrow plumbing and the banded join's losslessness are re-proved on
    the real output every driver round.  Corpus constant → the VALUES
    literal is data-independent."""
    import numpy as np

    from pql_spark.operators._jpeg import decode_jpeg, encode_jpeg
    from pql_spark.operators.multimodal import (
        phash_reference,
        synth_image,
    )

    hashes: dict[int, list[int]] = {
        k: phash_reference(
            decode_jpeg(encode_jpeg(synth_image(k), quality=90))
        )
        for k in range(64)
    }
    for k in range(6):
        img = np.clip(
            synth_image(k).astype(np.int64) + 6, 0, 255
        ).astype(np.uint8)
        hashes[100000 + k] = phash_reference(
            decode_jpeg(encode_jpeg(img, quality=90))
        )
    ids = sorted(hashes)
    pairs = [
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (h := sum(x != y for x, y in zip(hashes[a], hashes[b]))) <= 6
    ]
    rows = ", ".join(f"({a}, {b}, {h})" for a, b, h in pairs)
    return f"""
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(hamming AS INTEGER) AS hamming
FROM (VALUES {rows}) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b
"""


def _phash_dups_oracle() -> str:
    """Replayed-twin oracle for pHash image near-dup.  Checked
    INDEPENDENTLY of the operator: (a) the PNG encode→decode
    roundtrip — the twin hashes the SYNTH PIXELS directly and never
    touches the codec, so any lossy corruption in ``_png.py`` breaks
    the match; (b) the banded-Hamming LSH join — the twin brute-forces
    ALL pairs over sequentially computed hashes, so the banding's
    losslessness is re-proved on the real output every driver round;
    (c) the distributed Arrow plumbing.  The hash MATH is shared by
    construction (``phash_reference``, independently property-tested
    in tests/test_phash.py).  The gate corpus is constant, so the
    VALUES literal is data-independent."""
    import numpy as np

    from pql_spark.operators.multimodal import (
        phash_reference,
        synth_image,
    )

    hashes: dict[int, list[int]] = {
        k: phash_reference(synth_image(k)) for k in range(96)
    }
    for k in range(8):
        img = np.clip(
            synth_image(k).astype(np.int64) + 6, 0, 255
        ).astype(np.uint8)
        hashes[100000 + k] = phash_reference(img)
    ids = sorted(hashes)
    pairs = [
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (h := sum(x != y for x, y in zip(hashes[a], hashes[b]))) <= 6
    ]
    rows = ", ".join(f"({a}, {b}, {h})" for a, b, h in pairs)
    return f"""
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(hamming AS INTEGER) AS hamming
FROM (VALUES {rows}) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b
"""


def _audio_dups_oracle() -> str:
    """Replayed-twin oracle for audio-fingerprint near-dup — same
    device as _phash_dups_oracle.  The PCM16 quantization is
    replicated from the published WAV definition (clip·32767 → int16
    → /32767) rather than through the stdlib ``wave`` module, so the
    codec roundtrip is independently checked; pairs are brute-forced
    over sequentially computed fingerprints, re-proving the banded
    join lossless on the real output."""
    import numpy as np

    from pql_spark.operators.multimodal import synth_audio

    def pcm(sig: np.ndarray) -> np.ndarray:
        q = np.clip(
            np.asarray(sig) * 32767.0, -32768, 32767
        ).astype("<i2")
        return q.astype(np.float64) / 32767.0

    def fp(samples: np.ndarray, n_blocks: int = 32) -> list[int]:
        out = []
        for blk in np.array_split(samples, n_blocks):
            if blk.size < 2:
                out.append(0)
                continue
            mag = np.abs(np.fft.rfft(blk))
            out.append(int(mag[1:].argmax()) + 1)
        return out

    fps: dict[int, list[int]] = {
        k: fp(pcm(synth_audio(k))) for k in range(48)
    }
    for k in range(6):
        sig = synth_audio(k) * 0.5
        sig = sig + 0.002 * np.sin(np.arange(sig.size))
        fps[100000 + k] = fp(pcm(sig))
    ids = sorted(fps)
    pairs = [
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (h := sum(x != y for x, y in zip(fps[a], fps[b]))) <= 3
    ]
    rows = ", ".join(f"({a}, {b}, {h})" for a, b, h in pairs)
    return _hamming_pairs_values(rows)


def _video_dups_oracle() -> str:
    """Replayed-twin oracle for video near-dup — the _phash_dups_oracle
    device lifted to clips: vhashes are computed from the synth FRAMES
    directly (never through the AVI codec, so any corruption in
    ``_avi.py``'s encode→decode roundtrip breaks the match) and all
    pairs are brute-forced (re-proving the 16-band losslessness on the
    real output every driver round).  The frame-sampling indexes
    replicate video_phash's linspace(0, n-1, 4) over the 6-frame
    clips: frames 0, 1, 3, 5."""
    import numpy as np

    from pql_spark.operators.multimodal import (
        phash_reference,
        synth_video,
    )

    def vhash(frames) -> list[int]:
        idx = np.linspace(0, len(frames) - 1, 4).astype(int)
        out: list[int] = []
        for i in idx:
            out.extend(phash_reference(frames[i]))
        return out

    hashes: dict[int, list[int]] = {
        k: vhash(synth_video(k)) for k in range(48)
    }
    for k in range(6):
        hashes[100000 + k] = vhash(
            [
                np.clip(f.astype(np.int64) + 6, 0, 255).astype(np.uint8)
                for f in synth_video(k)
            ]
        )
    ids = sorted(hashes)
    pairs = [
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (h := sum(x != y for x, y in zip(hashes[a], hashes[b]))) <= 12
    ]
    rows = ", ".join(f"({a}, {b}, {h})" for a, b, h in pairs)
    return _hamming_pairs_values(rows)


def _gif_anim_dups_oracle() -> str:
    """Replayed-twin oracle for the mixed AVI/animated-GIF clip
    corpus: vhashes come from the coarsened synth frames directly
    (``_gif_anim_frames`` — neither codec is invoked oracle-side) and
    all pairs are brute-forced, so both container decode paths and
    the 16-band losslessness are re-proved on real output each
    round."""
    import numpy as np

    from pql_spark.operators.multimodal import phash_reference

    def vhash(frames) -> list[int]:
        idx = np.linspace(0, len(frames) - 1, 4).astype(int)
        out: list[int] = []
        for i in idx:
            out.extend(phash_reference(frames[i]))
        return out

    hashes: dict[int, list[int]] = {
        k: vhash(_gif_anim_frames(k)) for k in range(48)
    }
    for k in range(6):
        hashes[100000 + k] = vhash(_gif_anim_frames(k, shift=2))
    ids = sorted(hashes)
    pairs = [
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (h := sum(x != y for x, y in zip(hashes[a], hashes[b]))) <= 12
    ]
    rows = ", ".join(f"({a}, {b}, {h})" for a, b, h in pairs)
    return _hamming_pairs_values(rows)


def _hamming_pairs_values(rows: str) -> str:
    """Shared VALUES wrapper for the replayed media-pair twins."""
    return f"""
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(hamming AS INTEGER) AS hamming
FROM (VALUES {rows}) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b
"""


def _semantic_dedup_oracle(bare: bool = False) -> str:
    """Replayed-twin oracle for SemDeDup (r11): only the bounded
    deterministic k-means training is replayed in numpy (over the
    CLONED corpus, exactly as the gate trains it); everything
    distributed — clone construction, cell argmax, within-cell exact
    pairs, the brute-force pair graph, min-label components for both,
    and the precision/recall columns — is computed by DuckDB from the
    parquet with the centroids inlined as literals.  ``bare=True``
    stops at the keeper set (the _q_semantic_dedup_bare twin)."""
    import math as _m

    import duckdb as _dd
    import numpy as np

    rows = _dd.sql(
        "SELECT vec_id, embedding FROM"
        " '/root/testdata/sf0.01/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    base = [[float(v) for v in r[1]] for r in rows]
    clones = []
    for i in range(16):
        src = base[i % 8]
        clones.append(
            [x + ((i * 7 + j) % 5 - 2) * 0.0001
             for j, x in enumerate(src)]
        )
    x = np.array(base + clones, dtype=np.float64)  # id order: 0..499, _DUP_OFF..
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n_centroids, iters = 8, 10
    cents = x[np.linspace(0, len(x) - 1, n_centroids).astype(int)].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c = members.sum(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 1e-12:
                    cents[j] = c / nrm
    cell_structs = ", ".join(
        "struct_pack(s := list_dot_product(v, [{c}])"
        " / (sqrt(list_dot_product(v, v)) * {nc}), c := {i})".format(
            c=", ".join(repr(float(val)) for val in cent),
            nc=repr(_m.sqrt(sum(float(val) ** 2 for val in cent)) or 1.0),
            i=i,
        )
        for i, cent in enumerate(cents)
    )
    cos = (
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v)))"
    )
    head = f"""
WITH RECURSIVE
sb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT {_DUP_OFF} + i AS vec_id,
         [q.v[j + 1] + ((i * 7 + j) % 5 - 2) * 0.0001
          FOR j IN range(0, 64)] AS v
  FROM (SELECT vec_id AS src, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < 8) q,
       range(16) t(i)
  WHERE q.src = i % 8),
scell AS (SELECT vec_id, v,
            (list_max([{cell_structs}])).c AS cell FROM sb),
sp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM scell a JOIN scell b
         ON a.cell = b.cell AND a.vec_id < b.vec_id
       WHERE {cos} >= 0.9),
sedges AS (SELECT id_a AS a, id_b AS b FROM sp
           UNION ALL SELECT id_b, id_a FROM sp),
slab(id, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sedges) sn
  UNION
  SELECT e.a, l.label FROM sedges e JOIN slab l ON l.id = e.b),
sdrop AS (SELECT id FROM (SELECT id, min(label) AS comp
                          FROM slab GROUP BY id) sc
          WHERE comp != id)"""
    if bare:  # operator-only twin of _q_semantic_dedup_bare
        return head + """
SELECT vec_id FROM sb
WHERE vec_id NOT IN (SELECT id FROM sdrop)
ORDER BY vec_id
"""
    return head + f""",
bp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM sb a JOIN sb b ON a.vec_id < b.vec_id
       WHERE {cos} >= 0.9),
bedges AS (SELECT id_a AS a, id_b AS b FROM bp
           UNION ALL SELECT id_b, id_a FROM bp),
blab(id, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM bedges) bn
  UNION
  SELECT e.a, l.label FROM bedges e JOIN blab l ON l.id = e.b),
bdrop AS (SELECT id FROM (SELECT id, min(label) AS comp
                          FROM blab GROUP BY id) bc
          WHERE comp != id),
sstats AS (SELECT
  (SELECT count(*) FROM sdrop JOIN bdrop USING (id)) AS ni,
  (SELECT count(*) FROM sdrop) AS nd,
  (SELECT count(*) FROM bdrop) AS nb)
SELECT vec_id,
       CASE WHEN nd = 0 THEN 1.0 ELSE ni / nd END AS drop_precision,
       CASE WHEN nb = 0 THEN 1.0 ELSE ni / nb END AS drop_recall
FROM sb, sstats
WHERE vec_id NOT IN (SELECT id FROM sdrop)
  AND (CASE WHEN nd = 0 THEN 1.0 ELSE ni / nd END) >= 1.0
  AND (CASE WHEN nb = 0 THEN 1.0 ELSE ni / nb END) >= {_SD_RECALL_BOUND}
ORDER BY vec_id
"""


def _lsh_topk_oracle(bare: bool = False) -> str:
    """Exact DuckDB twin of _q_lsh_topk: the seeded hyperplanes are
    inlined as literals; buckets, the 1-bit probe ring, candidate
    cosine top-k, and the recall column all mirror the Spark plan's
    left-to-right double folds bit-for-bit.  ``bare=True`` stops at
    the operator output (the _q_lsh_topk_bare twin)."""
    hp = S.hyperplanes(64, 8, 42)
    planes_sql = ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in hp
    )
    bucket_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, p[{j + 1}]) >= 0"
        f" THEN {1 << j} ELSE 0 END"
        for j in range(8)
    )
    head = f"""
WITH pl AS (SELECT [{planes_sql}]::DOUBLE[][] AS p),
q0 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
lbase AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT {_DUP_OFF} + i AS vec_id,
         [qv[j + 1] + ((i * 7 + j) % 5 - 2) * 0.001 FOR j IN range(0, 64)]
  FROM q0, range(8) t(i)
),
lb AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM lbase, pl),
lqb AS (SELECT bucket AS qbucket FROM lb WHERE vec_id = 0),
lprobes AS (SELECT qbucket AS pr FROM lqb
            UNION ALL
            SELECT xor(qbucket, 1 << j) FROM lqb, range(8) t(j)),
lscored AS (SELECT vec_id,
              list_dot_product(v, qv)
                / (sqrt(list_dot_product(v, v))
                   * sqrt(list_dot_product(qv, qv))) AS cosine
            FROM lb, q0 WHERE bucket IN (SELECT pr FROM lprobes)),
lapprox AS (SELECT vec_id, cosine FROM lscored
            ORDER BY cosine DESC, vec_id ASC LIMIT 10)"""
    if bare:  # operator-only twin of _q_lsh_topk_bare
        return head + "\nSELECT vec_id, cosine FROM lapprox\n"
    return head + f""",
lexact AS (SELECT vec_id FROM (
             SELECT vec_id,
               list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(qv, qv))) AS c
             FROM lbase, q0 ORDER BY c DESC, vec_id ASC LIMIT 10)),
lrecall AS (SELECT count(*) / 10.0 AS recall_at_k
            FROM lapprox JOIN lexact USING (vec_id))
SELECT vec_id, cosine, recall_at_k FROM lapprox, lrecall
WHERE recall_at_k >= {_LSH_RECALL_BOUND}
"""


def _q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # digest the int8 vector — the driver's row-sort cannot order array
    # cells, so arrays never appear in final outputs
    return S.quantize_embeddings(_emb(spark, sf_dir)).select(
        "vec_id",
        F.md5(F.concat_ws(",", F.col("qvec").cast("array<string>"))).alias(
            "q_digest"
        ),
        "qscale",
    )


def _q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    # int8 prefilter + exact re-rank: equals brute-force top-k, so it
    # shares the exact-cosine oracle
    return S.quantized_topk(emb, qv, k=20)


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.pairwise_topk(_emb(spark, sf_dir), k=3, key_col="label")


def _q_knn_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted grouped kNN: identical results to pairwise_topk
    (shares _KNN_ORACLE), but each label group runs on `salt` Arrow
    tasks instead of one — the hot-cell survival path."""
    return S.pairwise_topk_skew(
        _emb(spark, sf_dir), k=3, key_col="label", salt=8
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = D.simhash(_docs(spark, sf_dir))
    return sh.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.col("simhash").cast("array<string>"))).alias(
            "simhash_fp"
        ),
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(_docs(spark, sf_dir))


def _q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.language_id(_docs(spark, sf_dir))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_score(_docs(spark, sf_dir))


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(_docs(spark, sf_dir))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.doc_fingerprint(_docs(spark, sf_dir))


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    return D.decontaminate(docs, bench, gram_n=_DECON_N).select(
        "doc_id", "lang", "source", "n_chars"
    )


def _q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" ssn 123-45-6789 card 4111111111111111"),
        ).alias("text"),
    )
    return X.redact_pii(docs)


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.chunk_documents(
        _docs(spark, sf_dir),
        chunk_size=_CHUNK_SIZE,
        overlap=_CHUNK_OVERLAP,
    )


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import pack_sequences

    stats = X.token_stats(_docs(spark, sf_dir)).select("doc_id", "n_tokens")
    return pack_sequences(
        stats, budget=_PACK_BUDGET, shards=_PACK_SHARDS
    )


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.repetition_stats(
        _docs(spark, sf_dir), top_n=_REP_TOP_N, dup_n=_REP_DUP_N
    )


def _q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 6h tumbling-window agg, drained via availableNow; the
    returned (batch) DataFrame is the stream's final state."""
    from pql_spark.streaming import (
        run_available_now_df,
        stream_parquet_table,
        windowed_agg,
    )

    stream = windowed_agg(
        stream_parquet_table(spark, sf_dir, "events"),
        window="6 hours",
        aggs={
            "n": F.count(F.lit(1)),
            # decimal sum: exact in any engine, so the 4-digit rounding is
            # deterministic (float sums differ across summation orders)
            "sum_value": F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 4
            ).cast("double"),
        },
    )
    return run_available_now_df(stream, "update")


def _q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.streaming import (
        run_available_now_df,
        sessionize,
        stream_parquet_table,
    )

    stream = sessionize(stream_parquet_table(spark, sf_dir, "events"),
                        gap="2 hours")
    sessions = run_available_now_df(stream, "complete").select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    )
    # fingerprint the ~80k session rows JVM-side: collecting them to
    # Python Rows costs ~0.5 s in the bench; the per-user rollup checks
    # the same session semantics (count, sizes, per-session rounded
    # sums as an exact decimal total, span endpoints) in 1.5k rows
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("sum_events"),
            F.sum(
                F.col("total_value").cast("decimal(18,4)")
            ).cast("double").alias("sum_value"),
            F.min("session_start").alias("first_start"),
            F.max("session_end").alias("last_end"),
        )
        .orderBy("user_id")
    )


def _q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.streaming import (
        run_available_now_df,
        stateful_user_counts,
        stream_parquet_table,
    )

    # key-group sharding: 8 shard groups instead of ~1500 per-user
    # Python calls per batch (identical emitted rows — see the operator)
    stream = stateful_user_counts(
        stream_parquet_table(spark, sf_dir, "events"), state_shards=8
    )
    out = run_available_now_df(stream, "update")
    # keep the LAST emitted row per user: totals are RUNNING, so the
    # final row is the one with the max n_events — expressed JVM-side
    # (max/max_by) instead of a collect + createDataFrame round-trip
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(
                F.max_by("total_value", "n_events"), 4
            ).alias("total_value"),
        )
        .orderBy("user_id")
    )


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import asof_join

    events = _cat(spark, sf_dir)("events")
    left = events.select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("sv")
    )
    out = asof_join(left, right, on="ts", by="user_id")
    # per-user rollup JVM-side: the raw join is |events| rows (1M at
    # sf1) and collecting them to Python Rows costs multiples of the
    # join itself (r6 post-mortem: plan 0.09 s, the gap was result
    # collection).  count/count(sv)/exact-decimal sums pin the same
    # match semantics in |users| rows.
    return (
        out.select(
            "event_id", "user_id", F.round("sv", 4).alias("sv")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("sv").alias("n_matched"),
            F.sum(
                F.col("sv").cast("decimal(18,4)")
            ).cast("double").alias("sum_sv"),
            F.sum("event_id").alias("sum_eid"),
        )
        .orderBy("user_id")
    )


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import range_join

    events = _cat(spark, sf_dir)("events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"),
        F.col("event_id").alias("purchase_id"),
    )
    out = range_join(clicks, purchases, by="user_id", bucket="2 hours")
    return out.select("click_id", "purchase_id")


def _q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.streaming import (
        run_available_now_df,
        stream_interval_join,
        stream_parquet_table,
    )

    events = stream_parquet_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = stream_interval_join(clicks, purchases, within="2 hours").select(
        "click_id", "purchase_id"
    )
    return run_available_now_df(joined, "append", no_data_batches=False)


def _q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import importance_weights

    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    tgt = docs.filter(F.col("source") == "src0")
    w = importance_weights(docs, tgt, gram_n=2)
    return w.select(
        "doc_id",
        F.floor(F.col("log_weight") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("lw"),
    ).orderBy("doc_id")


def _q_mix_corpora(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import mix_corpora

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    mixed = mix_corpora(
        docs,
        key="doc_id",
        domain_col="source",
        token_col="n_chars",
        weights={"src0": 6.0, "src1": 3.0, "src2": 1.0},
        budget_tokens=12000,
    )
    return mixed.orderBy("doc_id")


def _q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile (``profiling.profile_columns``,
    exact mode for the oracle): ONE aggregation pass over the table —
    row/null/exact-distinct counts + numeric ranges reshaped to one
    row per column; the DuckDB twin is a UNION ALL of per-column
    aggregates."""
    from pql_spark.operators import profile_columns

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return profile_columns(docs, approx=False).orderBy("column")


_PROFILE_ORACLE = """
SELECT 'doc_id' AS "column", 'bigint' AS dtype, count(*) AS n,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS DOUBLE) AS min_num,
       CAST(max(doc_id) AS DOUBLE) AS max_num
FROM documents
UNION ALL
SELECT 'lang', 'string', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT lang), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM documents
UNION ALL
SELECT 'source', 'string', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT source), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE)
FROM documents
UNION ALL
SELECT 'n_chars', 'bigint', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT n_chars),
       CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE)
FROM documents
ORDER BY "column"
"""


def _q_profile_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group dataset profile (``profile_columns(group_by=...)``):
    one groupBy pass, stats per (source, column)."""
    from pql_spark.operators import profile_columns

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    return profile_columns(
        docs, approx=False, group_by="source"
    ).orderBy("source", "column")


def _grouped_profile_oracle() -> str:
    parts = []
    for col, dtype, numeric in (
        ("doc_id", "bigint", True),
        ("n_chars", "bigint", True),
    ):
        mn = (
            f"CAST(min({col}) AS DOUBLE)"
            if numeric
            else "CAST(NULL AS DOUBLE)"
        )
        mx = (
            f"CAST(max({col}) AS DOUBLE)"
            if numeric
            else "CAST(NULL AS DOUBLE)"
        )
        parts.append(f"""
SELECT source, '{col}' AS "column", '{dtype}' AS dtype,
       count(*) AS n,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       count(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num
FROM documents GROUP BY source""")
    return (
        "\nUNION ALL\n".join(parts)
        + '\nORDER BY source, "column"'
    )


def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of documents.n_chars
    (``profiling.numeric_histogram``, explicit bounds: one narrow
    pass + a 12-row aggregate, edge clamping); the oracle repeats the
    identical floor/clamp arithmetic in DuckDB."""
    from pql_spark.operators import numeric_histogram

    docs = _docs(spark, sf_dir).select("n_chars")
    return numeric_histogram(docs, "n_chars", bins=12, lo=0.0, hi=600.0)


_HISTOGRAM_ORACLE = """
WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
           WHERE n_chars IS NOT NULL),
b AS (SELECT least(11, greatest(0,
              CAST(floor((x - 0.0) / 50.0) AS INT))) AS bin
      FROM v)
SELECT bin,
       0.0 + bin * 50.0 AS lo,
       0.0 + (bin + 1) * 50.0 AS hi,
       count(*) AS n
FROM b GROUP BY bin ORDER BY bin
"""


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled mixing (``sampling.temperature_mix``):
    domain weights derived as total^alpha — one per-domain aggregate,
    one broadcast 1-row sum(w), broadcast rate join + hash filter; the
    oracle repeats the identical formula and md5 bucket in DuckDB."""
    from pql_spark.operators import temperature_mix

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    mixed = temperature_mix(
        docs,
        key="doc_id",
        domain_col="source",
        token_col="n_chars",
        budget_tokens=12000,
        alpha=0.5,
    )
    return mixed.orderBy("doc_id")


_TMIX_ORACLE = """
WITH tot AS (SELECT source AS domain,
                    CAST(SUM(n_chars) AS DOUBLE) AS total
             FROM documents GROUP BY 1),
ws AS (SELECT SUM(pow(total, 0.5)) AS wsum FROM tot),
r AS (SELECT domain,
             least(1.0, 12000.0 * pow(total, 0.5) / ws.wsum / total)
               AS rate
      FROM tot, ws)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN r ON d.source = r.domain
WHERE ('0x' || substr(md5('tmix' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        ::BIGINT
      < CAST(floor(r.rate * 4294967296) AS BIGINT)
ORDER BY d.doc_id
"""


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import dedup_lines_corpus

    # documents are single-line; synthesize 5-word lines with a
    # regex portable to the DuckDB twin (tiny vocabulary → plenty of
    # cross-document duplicate lines, the C4 workload)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(
            "text", r"((?:\S+ ){4}\S+) ", "$1\n"
        ).alias("text"),
    )
    return dedup_lines_corpus(docs).orderBy("doc_id")


def _q_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import unimax_plan

    docs = _docs(spark, sf_dir).select("source", "n_chars")
    return unimax_plan(
        docs, domain_col="source", token_col="n_chars",
        budget_tokens=140000.0, max_epochs=1.0,
    ).orderBy("domain")


def _q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import unigram_lm_score

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return unigram_lm_score(docs, vocab_size=500).orderBy("doc_id")


def _q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import stratified_hash_sample, train_test_split

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    sampled = stratified_hash_sample(
        docs, key="doc_id", strata_col="lang",
        rates={"en": 0.5}, default_rate=0.9,
    )
    return train_test_split(sampled, key="doc_id", test_rate=0.2)


def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import winnow_fingerprints

    fps = winnow_fingerprints(_docs(spark, sf_dir), k=5, w=4)
    return fps.select(
        "doc_id",
        F.size("fingerprints").alias("n_fp"),
        F.md5(
            F.concat_ws(",", F.col("fingerprints").cast("array<string>"))
        ).alias("fp_digest"),
    )


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.streaming import (
        run_available_now_df,
        stream_dedup,
        stream_parquet_table,
    )

    events = stream_parquet_table(spark, sf_dir, "events")
    dup = events.withColumn(
        "copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("copy")
    deduped = stream_dedup(
        dup.select("event_id", "ts", "user_id"), subset=["event_id"]
    ).select("event_id", "user_id")
    out = run_available_now_df(deduped, "append", no_data_batches=False)
    # fingerprint the 100k deduped rows JVM-side (collect cost, as in
    # the sessionize gate): per-user count + exact id sum pins both
    # which rows survived and their multiplicity
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_eid"),
        )
        .orderBy("user_id")
    )


def _q_stream_sequence_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental stateful funnel matching — same chains as the batch
    `evaluate sequence_detect` (the oracle is the identical DuckDB
    union+window twin)."""
    from pql_spark.streaming import (
        run_available_now_df,
        stream_parquet_table,
        stream_sequence_detect,
    )

    events = stream_parquet_table(spark, sf_dir, "events")
    out = stream_sequence_detect(
        events,
        [
            ("v", "event_type = 'view'"),
            ("c", "event_type = 'click'"),
            ("p", "event_type = 'purchase'"),
        ],
        ts_col="ts",
        key_col="user_id",
        step_window="1d",
        span_window="2d",
        state_shards=8,
    )
    # run_available_now_df keeps the drained sink JVM-side — collecting
    # to Python Rows and re-wrapping with createDataFrame costs ~0.9 s
    # of pure serialization at sf0.1 (the r7 driver-bench regression)
    return run_available_now_df(
        out, "append", no_data_batches=False
    ).orderBy("user_id", "v_ts", "c_ts", "p_ts")


def _q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pql_spark.operators import kmv_distinct

    return kmv_distinct(
        _cat(spark, sf_dir)("events"), col="user_id", k=64
    )


def _q_crossdoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact substring duplication stats (Lee et al.
    2021): injected near-copies share long token runs with their
    originals, so the merged-span coverage is non-trivial.  The DuckDB
    twin keys grams by their STRING (exact) where Spark uses xxhash64
    — identical results absent a 2⁻⁶⁴ hash collision."""
    base = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") < 500
    )
    xtra = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    out = X.cross_doc_dup_spans(
        base.unionByName(xtra), gram_k=13
    )
    # no rounding: both engines divide the SAME integer pair, so the
    # doubles are bit-identical — rounding could only introduce a
    # cross-engine tie-break hazard
    return out.select(
        "doc_id", "n_tokens", "dup_tokens", "n_spans", "dup_token_frac"
    ).orderBy("doc_id")


_CROSSDOC_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 500
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
t AS (SELECT doc_id, {_WORDS} AS toks FROM base),
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(toks[i:i+12], ' ') AS gram
  FROM t, unnest(range(1, len(toks) - 13 + 2)) AS u(i)
  WHERE len(toks) >= 13),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING min(doc_id) != max(doc_id)),
m AS (SELECT g.doc_id, g.pos FROM g JOIN dup ON g.gram = dup.gram),
s AS (
  SELECT doc_id, pos,
         pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
  FROM m),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN gap IS NULL THEN 13
                  WHEN gap >= 13 THEN 13 ELSE gap END) AS dup_tokens,
         sum(CASE WHEN gap IS NULL OR gap >= 13 THEN 1 ELSE 0 END)
             AS n_spans
  FROM s GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.toks) AS INT) AS n_tokens,
       CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.dup_tokens, 0) AS DOUBLE)
           / greatest(len(t.toks), 1) AS dup_token_frac
FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
ORDER BY t.doc_id
"""


def _q_scrub_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al-style cross-doc substring scrub: lowest-id owner
    keeps each duplicated run, everyone else loses the covered
    tokens.  Text compared by md5 fingerprint (identical rebuild rule
    in DuckDB: kept tokens joined by single spaces)."""
    base = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") < 300
    )
    xtra = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xtra")).alias("text"),
    )
    out = X.scrub_cross_doc_dups(
        base.unionByName(xtra), gram_k=13
    )
    return out.select(
        "doc_id",
        F.md5("text").alias("text_fp"),
        "n_tokens_kept",
        "n_tokens_removed",
    ).orderBy("doc_id")


_SCRUB_CROSSDOC_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' xtra' AS text
  FROM documents WHERE doc_id < 50
),
t AS (SELECT doc_id, {_WORDS} AS toks FROM base),
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(toks[i:i+12], ' ') AS gram
  FROM t, unnest(range(1, len(toks) - 13 + 2)) AS u(i)
  WHERE len(toks) >= 13),
own AS (SELECT gram, min(doc_id) AS owner FROM g GROUP BY gram
        HAVING min(doc_id) != max(doc_id)),
sp AS (SELECT DISTINCT g.doc_id, g.pos + u.j AS p
       FROM g JOIN own ON g.gram = own.gram
                      AND g.doc_id != own.owner,
            unnest(range(0, 13)) AS u(j)),
spl AS (SELECT doc_id, list(p) AS ps FROM sp GROUP BY doc_id),
k AS (SELECT t.doc_id,
        CASE WHEN s.ps IS NULL THEN t.toks
             ELSE [t.toks[i + 1] FOR i IN range(0, len(t.toks))
                   IF NOT list_contains(s.ps, i)]
        END AS kept,
        coalesce(len(s.ps), 0) AS removed
      FROM t LEFT JOIN spl s ON t.doc_id = s.doc_id)
SELECT doc_id, md5(array_to_string(kept, ' ')) AS text_fp,
       CAST(len(kept) AS INT) AS n_tokens_kept,
       CAST(removed AS INT) AS n_tokens_removed
FROM k WHERE len(kept) > 0 ORDER BY doc_id
"""


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement
    (``sampling.weighted_sample``): inclusion ∝ n_chars, deterministic
    md5 randomness, global top-k as TakeOrderedAndProject.  The oracle
    replays the identical ln(u)/w arithmetic in DuckDB."""
    from pql_spark.operators import weighted_sample

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_sample(
        docs, k=500, weight_col="n_chars", key="doc_id"
    ).select("doc_id").orderBy("doc_id")


_WSAMPLE_ORACLE = """
WITH s AS (
  SELECT doc_id,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             + 1) / 4294967296.0)
           / CAST(n_chars AS DOUBLE) AS es
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id FROM (
  SELECT doc_id FROM s ORDER BY es DESC, doc_id LIMIT 500
) ORDER BY doc_id
"""


def _q_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (``operators.bpe.bpe_train``): the
    distributed word-frequency aggregate feeds the bounded-table merge
    loop (Sennrich et al. 2016).  Hash-checked (r11) against
    _bpe_oracle(): the twin computes the word-frequency table
    independently in DuckDB and replays the bounded deterministic
    merge loop sequentially; the trainer is also reference-checked in
    tests/test_bpe.py."""
    from pql_spark.operators import bpe_train

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return bpe_train(docs, num_merges=24).orderBy("rank")


def _q_bpe_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE (GPT-2 alphabet, ``byte_level=True``): same
    bounded merge loop over UTF-8 byte symbols — any script, zero OOV.
    Hash-checked like op_bpe (replayed twin); the byte table, hand
    example, CJK round-trip, and reference equivalence are tested in
    tests/test_bpe.py."""
    from pql_spark.operators import bpe_train

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return bpe_train(docs, num_merges=24, byte_level=True).orderBy("rank")


def _bpe_oracle(byte_level: bool, num_merges: int = 24) -> str:
    """Replayed-twin oracle for the BPE trainer (VERDICT r10 item 7).

    The distributed half of ``bpe_train`` is ONE aggregate — the word
    frequency table; the merge loop is a bounded deterministic driver
    fold.  The twin therefore (a) computes the word-frequency table
    INDEPENDENTLY in DuckDB (the same ``_WORDS`` tokenization every
    text gate hash-proves), (b) replays the merge loop with the
    standalone ~20-line reference below (freq-desc / lexicographic
    tie-breaks, Sennrich 2016 — written here, not imported from the
    operator), and (c) emits the expected merge table as a VALUES
    literal.  The driver's correctness gate is pinned to sf=0.01 by
    contract (TESTDATA.md), which is what makes a data-derived literal
    twin well-defined; the GPT-2 byte table is the published constant
    mapping (bijectivity property-tested in tests/test_bpe.py)."""
    import duckdb as _dd

    wf = _dd.sql(
        f"SELECT word, count(*) AS freq FROM (SELECT unnest({_WORDS})"
        " AS word FROM '/root/testdata/sf0.01/documents.parquet')"
        " WHERE word != '' GROUP BY word"
        " ORDER BY freq DESC, word LIMIT 65536"
    ).fetchall()
    if byte_level:
        from pql_spark.operators.bpe import bytes_to_unicode

        b2u = bytes_to_unicode()
        vocab = [
            (tuple(b2u[b] for b in w.encode("utf-8")), int(f))
            for w, f in wf
        ]
    else:
        vocab = [(tuple(w) + ("</w>",), int(f)) for w, f in wf]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = max(counts.values())
        if best < 2:
            break
        a, b = min(p for p, c in counts.items() if c == best)
        merges.append((rank, a, b, best))
        nxt = []
        for syms, f in vocab:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((tuple(out), f))
        vocab = nxt

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n  ".join(
        f"({r}, {q(a)}, {q(b)}, {fq})" for r, a, b, fq in merges
    )
    return f"""
SELECT CAST(rank AS INTEGER) AS rank, "left", "right",
       CAST(pair_freq AS BIGINT) AS pair_freq
FROM (VALUES
  {rows}
) AS t(rank, "left", "right", pair_freq)
ORDER BY rank
"""


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scoring against a 3-term query bag
    (``text.bm25_score``): per-term tf is an in-row array count, the
    N/avgdl/df stats come from one broadcast 1-row aggregate — zero
    corpus shuffles.  Scores are fixed-point (×1e6) for stable
    hashing; the oracle repeats the identical formula in DuckDB."""
    from pql_spark.operators import bm25_score

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = bm25_score(docs, ["join", "window", "spark"])
    # top-100 ranking — the natural output of a relevance scorer, and a
    # TakeOrderedAndProject instead of collecting every scored doc
    # (50k Python Rows cost ~1.6 s at sf1, dwarfing the scoring);
    # (score desc, doc_id asc) makes the LIMIT boundary deterministic
    return (
        out.select(
            "doc_id",
            F.floor(F.col("bm25") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(100)
    )


def _bm25_oracle() -> str:
    terms = ["join", "window", "spark"]
    tfs = ",\n         ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS DOUBLE)"
        f" AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS df{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln(1 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i} * 2.2"
        f" / (tf{i} + 1.2 * (0.25 + 0.75 * dl"
        " / greatest(avgdl, 1e-9))))"
        for i in range(len(terms))
    )
    return f"""
WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
d AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
         {tfs}
      FROM t),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
         {dfs}
      FROM d)
SELECT doc_id,
       CAST(floor(({parts}) * 1000000.0 + 0.5) AS BIGINT) AS score
FROM d, s ORDER BY score DESC, doc_id ASC LIMIT 100
"""


def _q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline, hash-checked end to end against
    _curate_corpus_oracle() — the chained DuckDB twins of every stage
    (each stage also oracle-checked on its own driver entry)."""
    from pql_spark.pipelines import curate_corpus

    docs = _docs(spark, sf_dir)
    out = curate_corpus(
        docs,
        min_quality=0.5,
        langs=None,
        near_dup_threshold=0.8,
        test_rate=0.1,
        max_dup_ngram_frac=0.98,
        benchmark=docs.filter(F.col("doc_id") % 97 == 0),
        decontaminate_gram_n=13,
        redact=True,
    )
    return out.select("doc_id", "lang_pred", "split").orderBy("doc_id")


def _geo_pts(spark: SparkSession, sf_dir: str, lo: int, hi: int) -> DataFrame:
    """Deterministic city-scale point cloud from event ids (the same
    arithmetic the DuckDB oracle runs, so doubles match bit-for-bit)."""
    ev = _cat(spark, sf_dir)("events").filter(
        (F.col("event_id") >= lo) & (F.col("event_id") < hi)
    )
    return ev.select(
        F.col("event_id").alias("id"),
        (F.lit(-122.5) + (F.col("event_id") % 1000) * 0.0005).alias("lon"),
        (F.lit(37.0) + ((F.col("event_id") * 7) % 1000) * 0.0005).alias("lat"),
    )


def _q_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-bucketed radius join (operators/geo.py) vs the oracle's
    brute-force cross join + haversine — proves the 3x3 ring loses no
    pairs.  Output is id pairs only (BIGINT), so the hash compare
    never touches a float."""
    from pql_spark.operators.geo import geo_radius_join

    a = _geo_pts(spark, sf_dir, 0, 2000)
    b = _geo_pts(spark, sf_dir, 2000, 4000)
    out = geo_radius_join(a, b, radius_m=200.0)
    return out.select("id_a", "id_b").orderBy("id_a", "id_b")


_GEO_JOIN_ORACLE = """
WITH a AS (
  SELECT event_id AS id_a,
         -122.5 + (event_id % 1000) * 0.0005 AS lon_a,
         37.0 + ((event_id * 7) % 1000) * 0.0005 AS lat_a
  FROM events WHERE event_id >= 0 AND event_id < 2000
), b AS (
  SELECT event_id AS id_b,
         -122.5 + (event_id % 1000) * 0.0005 AS lon_b,
         37.0 + ((event_id * 7) % 1000) * 0.0005 AS lat_b
  FROM events WHERE event_id >= 2000 AND event_id < 4000
)
SELECT id_a, id_b FROM a, b
WHERE 2.0 * 6371008.8 * asin(least(1.0, sqrt(
    pow(sin((radians(lat_b) - radians(lat_a)) / 2), 2)
    + cos(radians(lat_a)) * cos(radians(lat_b))
      * pow(sin((radians(lon_b) - radians(lon_a)) / 2), 2)
  ))) <= 200.0
ORDER BY id_a, id_b
"""


def _zipf_cdf(t: int = 20, s: float = 1.1) -> list[float]:
    w = [1.0 / (i + 1) ** s for i in range(t)]
    tot = sum(w)
    out, acc = [], 0.0
    for x in w:
        acc += x / tot
        out.append(acc)
    return out


_ZIPF_CDF = _zipf_cdf()


def _q_hamming_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic banded-Hamming join (dedup.hamming_dup_pairs — the
    engine shared by pHash image and audio-fingerprint near-dup) on
    its own hash-checked, data-proportional gate: 16 byte-valued
    symbols per doc from md5 nibble-pairs (portable arithmetic); docs
    with id % 40 == 1 carry their predecessor's signature with the
    first two positions bumped (+1 mod 256) → Hamming distance 2 <
    bands=8, the lossless pigeonhole setting.  The DuckDB twin mirrors
    the banded candidate generation (so it scales like the Spark plan
    at sf1 instead of brute-forcing n²) and the exact mismatch-count
    verify.

    The doc_id scan is rebalanced BEFORE the 16-md5 signature
    construction: the sf1 corpus is one parquet file = one input
    split, and an exchange added above the projection would leave the
    md5 work serialized on one core (measured 2.8 s → 0.8 s for the
    posting-list stage at sf1, PERF_NOTES_r12 — this was the whole
    unattributed 3.9× of VERDICT r11 item 1b)."""
    from pql_spark.operators._util import rebalance

    base = rebalance(_docs(spark, sf_dir).select("doc_id"))
    dup = F.col("doc_id") % 40 == 1
    seed = F.when(dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(
                        "_", seed.cast("string"), i.cast("string")
                    )),
                    1, 2,
                ),
                16, 10,
            ).cast("int")
            + F.when(dup & (i < 2), F.lit(1)).otherwise(F.lit(0))
        ) % 256,
    )
    df = base.select("doc_id", sig.alias("sig"))
    return D.hamming_dup_pairs(
        df, "sig", "doc_id", sig_len=16, threshold=2, bands=8
    )


_HAMMING_ORACLE = """
WITH hb AS (
  SELECT doc_id,
         CASE WHEN doc_id % 40 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
         (doc_id % 40 = 1) AS dup
  FROM documents),
hsig AS (
  SELECT doc_id,
         [(('0x' || substr(md5(seed::VARCHAR || '_' || i::VARCHAR), 1, 2))
              ::INT
           + CASE WHEN dup AND i < 2 THEN 1 ELSE 0 END) % 256
          FOR i IN range(0, 16)] AS sig
  FROM hb),
hbands AS (
  SELECT doc_id,
         array_to_string(sig[b * 2 + 1 : b * 2 + 2], ',') AS bkey,
         b AS band
  FROM hsig, range(8) t(b)),
hcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM hbands a JOIN hbands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
       CAST(len([i FOR i IN range(1, 17)
                 IF sa.sig[i] != sb.sig[i]]) AS INTEGER) AS hamming
FROM hcand
JOIN hsig sa ON id_a = sa.doc_id
JOIN hsig sb ON id_b = sb.doc_id
WHERE len([i FOR i IN range(1, 17) IF sa.sig[i] != sb.sig[i]]) <= 2
ORDER BY id_a, id_b
"""


def _geo_scale_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-proportional point cloud over ALL events: lattice sites
    from coprime moduli (2003, 1999) at 0.002° spacing (~170-220 m —
    wider than the join radius), collision-free through 4M ids; every
    id % 40 == 1 point sits ~26 m east of its predecessor's site, so
    the exact pair set is the planted (id-1, id) pairs and the count
    grows linearly with the table.  Past 4M ids (the sf10 decade:
    10M events) the lattice wraps and ids sharing a site form
    coincident-point pairs too — still ~O(n) extra pairs (~2.5
    ids/site) and still mirrored exactly by the twin (hash-checked at
    sf10), but the "planted pairs only" reading holds only below the
    wrap."""
    ev = _cat(spark, sf_dir)("events")
    dup = F.col("event_id") % 40 == 1
    base = F.when(dup, F.col("event_id") - 1).otherwise(F.col("event_id"))
    return ev.select(
        F.col("event_id").alias("id"),
        (
            F.lit(-122.5) + (base % 2003) * F.lit(0.002)
            + F.when(dup, F.lit(0.0003)).otherwise(F.lit(0.0))
        ).alias("lon"),
        (F.lit(37.0) + ((base * 7) % 1999) * F.lit(0.002)).alias("lat"),
    )


def _q_geo_join_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_radius_join at data-proportional size (ALL events,
    self-join) — the sf1 scaling row for the geo family (VERDICT r10
    item 6).  Explicit level (= radius_level(60)) keeps the plan
    deterministic; the twin mirrors the cell-bucketized join (Morton
    bins + 3×3 ring + haversine verify) so the ratio is
    like-for-like throughput, not brute-force-vs-index."""
    from pql_spark.operators.geo import geo_radius_join

    pts = _geo_scale_pts(spark, sf_dir)
    out = geo_radius_join(pts, pts, radius_m=60.0, level=18)
    return (
        out.select("id_a", "id_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .orderBy("id_a", "id_b")
    )


def _geo_join_scale_oracle(level: int = 18) -> str:
    n = 1 << level
    morton = (
        "list_sum([(CAST(FLOOR({x} / pow(2.0, i)) AS BIGINT) % 2)"
        " * CAST(pow(2.0, 2 * i + 1) AS BIGINT)"
        " + (CAST(FLOOR({y} / pow(2.0, i)) AS BIGINT) % 2)"
        f" * CAST(pow(2.0, 2 * i) AS BIGINT) FOR i IN range({level})])"
    )
    return f"""
WITH gp AS (
  SELECT event_id AS id,
         -122.5 + ((CASE WHEN event_id % 40 = 1 THEN event_id - 1
                         ELSE event_id END) % 2003) * 0.002
                + CASE WHEN event_id % 40 = 1 THEN 0.0003 ELSE 0.0 END
           AS lon,
         37.0 + (((CASE WHEN event_id % 40 = 1 THEN event_id - 1
                        ELSE event_id END) * 7) % 1999) * 0.002 AS lat
  FROM events),
gb AS (
  SELECT id, lon, lat,
         LEAST({n - 1}, FLOOR((lon + 180.0) / 360.0 * {float(n)}))
           AS bx,
         LEAST({n - 1}, FLOOR((lat + 90.0) / 180.0 * {float(n)}))
           AS by
  FROM gp),
ga AS (SELECT id, lon, lat,
              {morton.format(x='bx', y='by')} AS cell FROM gb),
gring AS (
  SELECT id, lon, lat,
         {morton.format(x=f'((bx + dx + {n}) % {n})', y='(by + dy)')}
           AS cell
  FROM gb, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                   (1,-1),(1,0),(1,1)) t(dx, dy)
  WHERE by + dy BETWEEN 0 AND {n - 1})
SELECT a.id AS id_a, b.id AS id_b
FROM ga a JOIN gring b USING (cell)
WHERE a.id < b.id
  AND 2.0 * 6371008.8 * asin(least(1.0, sqrt(
        pow(sin((radians(b.lat) - radians(a.lat)) / 2), 2)
        + cos(radians(a.lat)) * cos(radians(b.lat))
          * pow(sin((radians(b.lon) - radians(a.lon)) / 2), 2)
      ))) <= 60.0
ORDER BY id_a, id_b
"""


def _q_ngram_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin prefix filter on a Zipfian-boilerplate corpus (r10):
    300 docs built from PORTABLE arithmetic (md5 hex tokens + an
    integer-mix Zipf template pick), so the DuckDB oracle constructs
    the IDENTICAL text and brute-forces exact 3-gram Jaccard — the
    hash match proves prefix_filter=True is lossless on the corpus
    shape it exists for (hot boilerplate grams; top template in ~26 %
    of docs)."""
    from pql_spark.operators.dedup import ngram_jaccard_pairs

    cdf = F.array(*[F.lit(c) for c in _ZIPF_CDF])
    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    dup = (F.col("doc_id") % 40) == 1
    seed = F.when(dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    content = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.when(
            dup & (i == 19),
            F.concat(
                F.lit("x"),
                F.substring(
                    F.md5(F.col("doc_id").cast("string")), 1, 8
                ),
            ),
        ).otherwise(
            F.concat(
                F.lit("c"),
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_", seed.cast("string"), i.cast("string")
                        )
                    ),
                    1, 8,
                ),
            )
        ),
    )
    u = ((seed * F.lit(2654435761)) % F.lit(1000000)).cast(
        "double"
    ) / F.lit(1000000.0)
    tmpl = F.size(F.filter(cdf, lambda c: c < u))
    bp = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.concat_ws(
            "", F.lit("b"), tmpl.cast("string"), F.lit("t"),
            j.cast("string"),
        ),
    )
    corpus = docs.select(
        "doc_id",
        F.concat_ws(" ", F.concat(content, bp)).alias("text"),
    )
    return ngram_jaccard_pairs(
        corpus, shingle_k=3, threshold=0.5, prefix_filter=True
    )


_NGRAM_ZIPF_ORACLE = f"""
WITH ids AS (SELECT range AS doc_id FROM range(300)),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 40 = 1 THEN doc_id - 1
              ELSE doc_id END AS seed,
         (doc_id % 40 = 1) AS dup
  FROM ids
), toks AS (
  SELECT doc_id,
    [CASE WHEN dup AND i = 19
          THEN 'x' || substring(md5(doc_id::VARCHAR), 1, 8)
          ELSE 'c' || substring(
                 md5(seed::VARCHAR || '_' || i::VARCHAR), 1, 8)
     END for i in range(20)]
    ||
    ['b' || len(list_filter({_ZIPF_CDF!r},
          c -> c < ((seed * 2654435761) % 1000000) / 1000000.0)
       )::VARCHAR || 't' || j::VARCHAR
     for j in range(8)] AS t
  FROM base
), grams AS (
  SELECT doc_id,
    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                   for i in range(1, len(t) - 1)]) AS g
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
         AS jaccard
FROM grams a, grams b
WHERE a.doc_id < b.doc_id
  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
      >= 0.5
ORDER BY id_a, id_b
"""


def _q_curate_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA-report stage of the curation pipeline (r10): kept-vs-dropped
    cohort profile + stage accounting, emitted as one frame.
    Hash-checked against _curate_qa_oracle() (r11): the composed stage
    twins drive per-stage survivor counts and cohort null/row counts;
    the profile device itself is also hash-gated by
    op_profile/op_profile_grouped and the accounting invariants by
    tests/test_pipelines.py."""
    from pql_spark.pipelines import curate_corpus

    qa: dict = {}
    # doc_id < 2000: full corpus at the sf0.01 correctness scale;
    # caps the bench cost at sf0.1 (the QA frames deliberately re-run
    # the annotated lineage, so gate cost is ~2x the pipeline's)
    curate_corpus(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 2000),
        min_quality=0.5,
        langs=None,
        near_dup_threshold=0.8,
        test_rate=0.1,
        qa=qa,
    )
    from pql_spark.operators._util import sql_over

    # one parse for the report reshaping (r16 driver-cost pass)
    return sql_over(
        {"prof": qa["profile"], "counts": qa["stage_counts"]},
        "SELECT cohort, column AS item, n, n_null FROM {prof}"
        " UNION ALL"
        " SELECT 'stage' AS cohort, stage AS item, rows AS n,"
        " CAST(0 AS BIGINT) AS n_null FROM {counts}"
        " ORDER BY cohort, item",
    )


def _q_phash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash image near-dup (r10): 96 real-PNG images + 8 planted
    brightness-shifted clones; banded-Hamming join at a lossless
    setting (6 < 8 bands).  Hash-checked (r11): _phash_dups_oracle()
    replays the constant corpus sequentially — hashing the synth
    PIXELS (so the PNG roundtrip is independently verified) and
    brute-forcing all pairs (so the banding's losslessness is
    re-proved on real output each round); reference-math parity is
    additionally pinned by tests/test_phash.py."""
    import numpy as np

    from pql_spark.operators.multimodal import (
        phash_dup_pairs,
        synth_image,
        synthesize_png_media,
    )
    from pql_spark.operators._png import encode_png

    base = synthesize_png_media(spark, n=96)

    def clones(ids):
        import pandas as pd

        for pdf in ids:
            rows = []
            for media_id in pdf["id"]:
                k = int(media_id)
                img = np.clip(
                    synth_image(k).astype(np.int64) + 6, 0, 255
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": 100000 + k,
                        "kind": "image",
                        "payload": encode_png(img),
                        "meta": {
                            "width": 48, "height": 32,
                            "duration_ms": 0, "codec": "png",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    extra = spark.range(0, 8, 1, 1).mapInPandas(clones, base.schema)
    media = base.unionByName(extra)
    return phash_dup_pairs(media, threshold_bits=6, bands=8)


def _q_jpeg_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG image near-dup (r14, the dominant real-world image format
    via the pure-stdlib baseline codec ``_jpeg.py``): 64 real-JFIF
    images + 6 planted brightness-shifted clones, pHash over the
    DECODED pixels, banded-Hamming join at a lossless setting
    (6 < 8 bands).  Hash-checked: _jpeg_dups_oracle() replays the
    constant corpus sequentially — re-decoding each payload with the
    same pure codec driver-side (decode determinism + Arrow plumbing
    verified; the codec itself carries independent proofs in
    tests/test_jpeg.py: entropy layer bit-exact vs the numpy
    quantizer, PSNR floors, Annex-K-style DHT generality) and
    brute-forcing ALL pairs (banding losslessness re-proved on real
    output each round)."""
    import numpy as np
    import pandas as pd

    from pql_spark.operators._jpeg import encode_jpeg
    from pql_spark.operators.multimodal import (
        phash_dup_pairs,
        synth_image,
        synthesize_jpeg_media,
    )

    base = synthesize_jpeg_media(spark, n=64, quality=90)

    def clones(ids):
        for pdf in ids:
            rows = []
            for media_id in pdf["id"]:
                k = int(media_id)
                img = np.clip(
                    synth_image(k).astype(np.int64) + 6, 0, 255
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": 100000 + k,
                        "kind": "image",
                        "payload": encode_jpeg(img, quality=90),
                        "meta": {
                            "width": 48, "height": 32,
                            "duration_ms": 0, "codec": "jpeg",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    extra = spark.range(0, 6, 1, 1).mapInPandas(clones, base.schema)
    media = base.unionByName(extra)
    return phash_dup_pairs(
        media, threshold_bits=6, bands=8, decoder="jpeg"
    )


def _q_gif_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF image near-dup (r14): 64 real-GIF palettized images + 6
    planted brightness-shifted clones, pHash over the DECODED pixels,
    banded-Hamming join at a lossless setting (6 < 8 bands).
    Hash-checked: _gif_dups_oracle() hashes the synth PIXELS directly
    — GIF is lossless for palettized content, so any corruption in
    the LZW/container layer breaks the match (the PNG-twin discipline)
    — and brute-forces ALL pairs, re-proving the banding lossless."""
    import numpy as np
    import pandas as pd

    from pql_spark.operators._gif import encode_gif
    from pql_spark.operators.multimodal import (
        phash_dup_pairs,
        synth_image_palettized,
        synthesize_gif_media,
    )

    base = synthesize_gif_media(spark, n=64)

    def clones(ids):
        for pdf in ids:
            rows = []
            for media_id in pdf["id"]:
                k = int(media_id)
                img = np.clip(
                    synth_image_palettized(k).astype(np.int64) + 6,
                    0, 255,
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": 100000 + k,
                        "kind": "image",
                        "payload": encode_gif(img),
                        "meta": {
                            "width": 48, "height": 32,
                            "duration_ms": 0, "codec": "gif",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    extra = spark.range(0, 6, 1, 1).mapInPandas(clones, base.schema)
    media = base.unionByName(extra)
    return phash_dup_pairs(
        media, threshold_bits=6, bands=8, decoder="gif"
    )


def _q_audio_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup (r10): 48 real-WAV two-tone clips +
    6 planted volume-scaled clones; generic banded-Hamming join at a
    lossless setting (3 < 8 bands).  Hash-checked (r11):
    _audio_dups_oracle() replays the corpus with the PCM16
    quantization replicated from the WAV definition (codec roundtrip
    independently verified) and brute-forces all pairs; clone
    recovery also pinned by tests."""
    import numpy as np
    import pandas as pd

    from pql_spark.operators.multimodal import (
        audio_dup_pairs,
        encode_wav,
        synth_audio,
        synthesize_wav_media,
    )

    base = synthesize_wav_media(spark, n=48)

    def clones(ids):
        for pdf in ids:
            rows = []
            for media_id in pdf["id"]:
                k = int(media_id)
                sig = synth_audio(k) * 0.5
                sig = sig + 0.002 * np.sin(np.arange(sig.size))
                rows.append(
                    {
                        "media_id": 100000 + k,
                        "kind": "audio",
                        "payload": encode_wav(sig),
                        "meta": {
                            "width": 0, "height": 0,
                            "duration_ms": 250, "codec": "wav",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    extra = spark.range(0, 6, 1, 1).mapInPandas(clones, base.schema)
    return audio_dup_pairs(
        base.unionByName(extra), threshold=3, bands=8
    )


def _q_video_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup (r13, closes the last honest media stub): 48
    real uncompressed-AVI panning clips + 6 planted brightness-shifted
    clones; sampled-frame pHash concatenation (4 frames × 64 bits) +
    the generic banded-Hamming join at a lossless setting (12 < 16
    bands).  Hash-checked: _video_dups_oracle() replays the constant
    corpus sequentially — hashing the synth FRAMES directly (so the
    AVI encode→decode roundtrip is independently verified) and
    brute-forcing all pairs (so the banding's losslessness is
    re-proved on real output each round); the RIFF codec itself is
    pinned by tests/test_avi.py."""
    import numpy as np
    import pandas as pd

    from pql_spark.operators._avi import encode_avi
    from pql_spark.operators.multimodal import (
        synth_video,
        synthesize_avi_media,
        video_dup_pairs,
    )

    base = synthesize_avi_media(spark, n=48)

    def clones(ids):
        for pdf in ids:
            rows = []
            for media_id in pdf["id"]:
                k = int(media_id)
                frames = [
                    np.clip(f.astype(np.int64) + 6, 0, 255).astype(
                        np.uint8
                    )
                    for f in synth_video(k)
                ]
                rows.append(
                    {
                        "media_id": 100000 + k,
                        "kind": "video",
                        "payload": encode_avi(frames, fps=10),
                        "meta": {
                            "width": 48, "height": 32,
                            "duration_ms": 600,
                            "codec": "rawvideo/bgr24",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    extra = spark.range(0, 6, 1, 1).mapInPandas(clones, base.schema)
    return video_dup_pairs(
        base.unionByName(extra), threshold_bits=12, bands=16
    )


def _gif_anim_frames(k: int, shift: int = 0):
    """Deterministic GIF-encodable clip: the synth_video panning
    pattern color-coarsened to 4 levels/channel (≤64 distinct colors
    per frame, so the lossless palettized GIF encoder accepts it);
    ``shift`` brightens before coarsening for the planted clones.
    Shared verbatim by the gate and its replayed-twin oracle."""
    import numpy as np

    from pql_spark.operators.multimodal import synth_video

    return [
        (
            np.clip(f.astype(np.int64) + shift, 0, 255) // 64 * 64
        ).astype(np.uint8)
        for f in synth_video(k)
    ]


def _q_gif_anim_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF video near-dup (r15): a MIXED-container corpus —
    24 uncompressed-AVI clips (even ids) and 24 animated-GIF clips
    (odd ids) of color-coarsened panning content, plus 6 GIF-encoded
    brightness-shifted clones of the first clips — through
    video_dup_pairs, whose per-row container sniff (decode_video)
    composites GIF89a animations into frames.  Hash-checked:
    _gif_anim_dups_oracle() hashes the coarsened synth FRAMES directly
    (never through either codec, so corruption in the AVI parse OR the
    GIF LZW/animation compositing breaks the match — and clone pairs
    spanning containers prove both decode to identical pixels) and
    brute-forces all pairs at the lossless 12 < 16 banding."""
    import pandas as pd

    from pql_spark.operators._avi import encode_avi
    from pql_spark.operators._gif import encode_gif_animated
    from pql_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_dup_pairs,
    )

    def gen(it):
        for pdf in it:
            rows = []
            for media_id in pdf["id"]:
                k = int(media_id)
                if k >= 100000:
                    frames = _gif_anim_frames(k - 100000, shift=2)
                    payload = encode_gif_animated(frames, delays_cs=10)
                    codec = "gif89a-anim"
                elif k % 2 == 0:
                    frames = _gif_anim_frames(k)
                    payload = encode_avi(frames, fps=10)
                    codec = "rawvideo/bgr24"
                else:
                    frames = _gif_anim_frames(k)
                    payload = encode_gif_animated(frames, delays_cs=10)
                    codec = "gif89a-anim"
                rows.append(
                    {
                        "media_id": k,
                        "kind": "video",
                        "payload": payload,
                        "meta": {
                            "width": 48, "height": 32,
                            "duration_ms": 600, "codec": codec,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    ids = spark.range(0, 48, 1, 4).unionByName(
        spark.range(100000, 100006, 1, 1)
    )
    media = ids.mapInPandas(gen, MEDIA_SCHEMA)
    return video_dup_pairs(media, threshold_bits=12, bands=16)


def _q_mp3_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 header featurization (r15): a deterministic corpus of 48
    header-valid MPEG-1 Layer III streams is parsed in Arrow batches
    (``mapInPandas`` — the realistic shape: binary payloads → typed
    feature columns, no PCM synthesized).  Oracle
    :func:`_mp3_features_oracle` computes every expected value
    ANALYTICALLY from the synthesis parameters — the parser is never
    invoked on the oracle side, so a header-walk bug breaks the match.
    """

    def gen(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                m = M.mp3_headers(
                    M.synth_mp3(
                        k, 12 + k % 9, sr_idx=k % 3, vbr=bool(k % 2)
                    )
                )
                rows.append(
                    {
                        "media_id": k,
                        "n_frames": m["n_frames"],
                        "sample_rate": m["sample_rate"],
                        "duration_sec": m["duration_sec"],
                        "bitrate_kbps_mean": m["bitrate_kbps_mean"],
                        "vbr": int(m["vbr"]),
                        "layer": m["layer"],
                        "channels": m["channels"],
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, 48, 1, 4)
        .mapInPandas(
            gen,
            "media_id long, n_frames int, sample_rate int,"
            " duration_sec double, bitrate_kbps_mean double,"
            " vbr int, layer int, channels int",
        )
        .orderBy("media_id")
    )


def _mp3_features_oracle() -> str:
    """Analytic ground truth for :func:`_q_mp3_features`: n_frames,
    rate, duration and mean bitrate derived from the synth parameters
    alone (the V1L3 bitrate table indexed the way ``synth_mp3`` draws
    it) — a data-independent VALUES literal."""
    from pql_spark.operators.multimodal import _MP3_BITRATE, _MP3_SAMPLERATE

    rows = []
    for k in range(48):
        n, sr_idx, vbr = 12 + k % 9, k % 3, bool(k % 2)
        sr = _MP3_SAMPLERATE["1"][sr_idx]
        idxs = [9 if not vbr else 5 + ((k + i) % 8) for i in range(n)]
        kbps = [_MP3_BITRATE[("1", 3)][j - 1] for j in idxs]
        rows.append(
            f"({k}, {n}, {sr}, {round(n * 1152 / sr, 6)},"
            f" {round(sum(kbps) / n, 3)}, {int(len(set(kbps)) > 1)},"
            " 3, 1)"
        )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(n_frames AS INTEGER) AS n_frames,
       CAST(sample_rate AS INTEGER) AS sample_rate,
       CAST(duration_sec AS DOUBLE) AS duration_sec,
       CAST(bitrate_kbps_mean AS DOUBLE) AS bitrate_kbps_mean,
       CAST(vbr AS INTEGER) AS vbr,
       CAST(layer AS INTEGER) AS layer,
       CAST(channels AS INTEGER) AS channels
FROM (VALUES {", ".join(rows)}) AS t(media_id, n_frames, sample_rate,
     duration_sec, bitrate_kbps_mean, vbr, layer, channels)
ORDER BY media_id
"""


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(spark, n=128, kind="image")
    feats = M.extract_features(media, dim=16, decoder="fake")
    return feats.select(
        "media_id", "kind", "n_bytes", F.size("feature").alias("dim")
    )


# ----------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _pql(PQL_QUERIES["pql_q1_pricing"][0])(
        spark, "/root/testdata/sf0.001"
    )


# Order matters: the driver's correctness gate processed exactly the
# FIRST 50 queries() entries in round 1.  This list front-loads a
# representative mix — every §2 operator family plus the flagship
# data-pipeline operators — so both tiers get hash-checked evidence.
# Everything not listed follows afterwards (bench still runs all).
_CHECK_FIRST = [
    # Round-16 rotation (continuing the VERDICT r14 item 1 policy):
    # the 41 gates whose latest hash-green is r12 — verified by
    # tools/evidence_freshness.py — plus the 9 gates whose EXECUTED
    # code this optimization round changed (one-parse SQL twins,
    # stage-count fold, json_tuple bag_unpack), so the driver's own
    # hashes re-pin every touched path.  After this window nothing
    # predates r13.  Exactly 50.
    #
    # 1. r12-stale gates (41):
    "op_bm25", "op_cosine_topk", "op_dedup_exact", "op_geo_join",
    "op_kmv_distinct", "op_langid", "op_quality", "op_range_join",
    "op_scrub_crossdoc", "op_simhash", "op_stream_windowed",
    "op_token_stats", "pql_active_users_count", "pql_array_set_fns",
    "pql_autocluster", "pql_bag_unpack", "pql_bag_unpack_schema",
    "pql_binary_fns", "pql_case_fn", "pql_count", "pql_datetime_fns",
    "pql_diffpatterns", "pql_events_daily", "pql_facet_counts",
    "pql_facet_main", "pql_fork_hot", "pql_ipv4_fns",
    "pql_ipv4_lookup", "pql_ipv6_lookup", "pql_let_fn",
    "pql_mv_itemindex", "pql_narrow", "pql_q1_pricing",
    "pql_sample_distinct", "pql_scan_funnel", "pql_scan_var_window",
    "pql_sequence_detect", "pql_string_fns", "pql_tabular_let",
    "pql_top_nested_others", "pql_union_inner",
    # 2. gates whose executed code changed this round (9):
    "op_curate_qa", "op_curate_corpus", "op_minhash_dups",
    "op_dedup_clusters", "op_ngram_jaccard", "op_ngram_zipf_prefix",
    "op_histogram", "op_profile", "op_profile_grouped",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _pql(text, _PQL_BACKEND_PINS.get(name, "auto"))
        for name, (text, _) in PQL_QUERIES.items()
    }
    out.update(
        {
            "pql_facet_counts": _q_facet_counts,
            "pql_facet_main": _q_facet_main,
            "pql_fork_hot": _q_fork_hot,
            "pql_fork_daily": _q_fork_daily,
            "op_dedup_exact": _q_dedup_exact,
            "op_fingerprint": _q_fingerprint,
            "op_token_stats": _q_token_stats,
            "op_quality": _q_quality,
            "op_langid": _q_langid,
            "op_repetition": _q_repetition,
            "op_decontaminate": _q_decontaminate,
            "op_redact_pii": _q_redact_pii,
            "op_chunk_documents": _q_chunk_documents,
            "op_pack_sequences": _q_pack_sequences,
            "op_ngram_jaccard": _q_ngram,
            "op_minhash_dups": _q_minhash,
            "op_dedup_clusters": _q_dedup_clusters,
            "op_simhash": _q_simhash,
            "op_embedding_dups": _q_cosine_pairs,
            "op_cosine_topk": _q_cosine_topk,
            "op_quantize_embeddings": _q_quantize,
            "op_quantized_topk": _q_quantized_topk,
            "op_lsh_topk": _q_lsh_topk,  # hash-checked + recall column
            "op_semantic_dedup": _q_semantic_dedup,  # hash-checked + quality cols
            "op_ivf_topk": _q_ivf_topk,  # hash-checked + recall column
            # bare rows: operator only, the bench regression surface
            "op_lsh_topk_bare": _q_lsh_topk_bare,
            "op_ivf_topk_bare": _q_ivf_topk_bare,
            "op_semantic_dedup_bare": _q_semantic_dedup_bare,
            # r12 cross-cell recall knob, measured rows per passes=
            "op_semantic_passes": _q_semantic_passes,
            "op_knn_grouped": _q_knn,
            "op_knn_skew": _q_knn_skew,
            "op_multimodal_features": _q_multimodal,  # plumbing-contract oracle
            "op_mp3_features": _q_mp3_features,  # hash-checked (analytic twin)
            "op_phash_dups": _q_phash_dups,  # hash-checked (replayed twin)
            "op_audio_dups": _q_audio_dups,  # hash-checked (replayed twin)
            "op_video_dups": _q_video_dups,  # hash-checked (replayed twin)
            "op_gif_anim_dups": _q_gif_anim_dups,  # hash-checked (replayed twin)
            "op_jpeg_dups": _q_jpeg_dups,  # hash-checked (replayed twin)
            "op_gif_dups": _q_gif_dups,  # hash-checked (replayed twin)
            "op_ngram_zipf_prefix": _q_ngram_zipf,
            "op_stream_windowed": _q_stream_windowed,
            "op_stream_sink_upsert": _q_stream_sink_upsert,
            "op_multimodal_decode": _q_multimodal_decode,
            "op_multimodal_audio": _q_multimodal_audio,
            "op_stream_near_dup": _q_stream_near_dup,
            "op_near_dup_incremental": _q_near_dup_incremental,
            "op_curate_stream": _q_curate_stream,
            "op_stream_sequence_detect": _q_stream_sequence_detect,
            "pql_series_fit_2lines": _q_fit_2lines,
            "op_stream_sessionize": _q_stream_sessionize,
            "op_stream_stateful": _q_stream_stateful,
            "op_asof_join": _q_asof,
            "op_range_join": _q_range_join,
            "op_stream_interval_join": _q_stream_interval_join,
            "op_stream_dedup": _q_stream_dedup,
            "op_kmv_distinct": _q_kmv_distinct,
            "op_winnow_fingerprints": _q_winnow,
            "op_sampling_split": _q_sampling,
            "op_mix_corpora": _q_mix_corpora,
            "op_temperature_mix": _q_temperature_mix,
            "op_profile": _q_profile,
            "op_histogram": _q_histogram,
            "op_profile_grouped": _q_profile_grouped,
            "op_importance_weights": _q_importance_weights,
            "op_unimax_mix": _q_unimax,
            "op_lm_score": _q_lm_score,
            "op_bm25": _q_bm25,
            "op_bpe": _q_bpe,  # rows-only (iterative merge loop)
            "op_bpe_bytes": _q_bpe_bytes,  # rows-only (same loop)
            "op_weighted_sample": _q_weighted_sample,
            "op_line_dedup": _q_line_dedup,
            "op_crossdoc_dedup": _q_crossdoc_dedup,
            "op_scrub_crossdoc": _q_scrub_crossdoc,
            "op_curate_corpus": _q_curate_corpus,
            "op_curate_qa": _q_curate_qa,
            "op_geo_join": _q_geo_join,
            "op_geo_join_scale": _q_geo_join_scale,
            "op_hamming_dups": _q_hamming_dups,
        }
    )
    ordered = {n: out[n] for n in _CHECK_FIRST}
    ordered.update(out)
    assert len(ordered) == len(out), "CHECK_FIRST must not invent names"
    return ordered


def oracle_sql() -> dict[str, str]:
    # None oracle ⇒ genuinely non-SQL-expressible (iterative/stateful)
    # → omitted; the driver records a rows-only check for those
    out = {
        name: sql
        for name, (_, sql) in PQL_QUERIES.items()
        if sql is not None
    }
    out.update(
        {
            "pql_facet_counts": _FACET_COUNTS_ORACLE,
            "pql_facet_main": _FACET_MAIN_ORACLE,
            "pql_fork_hot": _FORK_HOT_ORACLE,
            "pql_fork_daily": _FORK_DAILY_ORACLE,
            "op_dedup_exact": _DEDUP_EXACT_ORACLE,
            "op_fingerprint": _FINGERPRINT_ORACLE,
            "op_token_stats": _TOKEN_STATS_ORACLE,
            "op_quality": _QUALITY_ORACLE,
            "op_langid": _langid_oracle(),
            "op_repetition": _REPETITION_ORACLE,
            "op_decontaminate": _DECON_ORACLE,
            "op_redact_pii": _redact_oracle(),
            "op_chunk_documents": _CHUNK_ORACLE,
            "op_pack_sequences": _PACK_ORACLE,
            "op_ngram_jaccard": _NGRAM_ORACLE,
            "op_minhash_dups": _minhash_oracle(),
            "op_curate_corpus": _curate_corpus_oracle(),
            "op_curate_qa": _curate_qa_oracle(),
            "op_lsh_topk": _lsh_topk_oracle(),
            "op_ivf_topk": _ivf_topk_oracle(),
            "op_semantic_dedup": _semantic_dedup_oracle(),
            "op_lsh_topk_bare": _lsh_topk_oracle(bare=True),
            "op_ivf_topk_bare": _ivf_topk_oracle(bare=True),
            "op_semantic_dedup_bare": _semantic_dedup_oracle(bare=True),
            "op_semantic_passes": _semantic_passes_oracle(),
            "op_phash_dups": _phash_dups_oracle(),
            "op_jpeg_dups": _jpeg_dups_oracle(),
            "op_gif_dups": _gif_dups_oracle(),
            "op_mp3_features": _mp3_features_oracle(),
            "op_audio_dups": _audio_dups_oracle(),
            "op_video_dups": _video_dups_oracle(),
            "op_gif_anim_dups": _gif_anim_dups_oracle(),
            # the multimodal-features gate projects the PLUMBING
            # contract only (id, kind, byte count, feature dim) over
            # the deterministic fake-media table (fixed 1024-byte
            # payloads) — directly SQL-expressible; the feature values
            # themselves are binary-derived and pinned by unit tests
            "op_multimodal_features": (
                "SELECT CAST(i AS BIGINT) AS media_id,"
                " 'image' AS kind, CAST(1024 AS BIGINT) AS n_bytes,"
                " CAST(16 AS INTEGER) AS dim"
                " FROM range(128) t(i) ORDER BY media_id"
            ),
            "op_bpe": _bpe_oracle(byte_level=False),
            "op_bpe_bytes": _bpe_oracle(byte_level=True),
            "op_dedup_clusters": _dedup_clusters_oracle(),
            "op_simhash": _simhash_oracle(),
            "op_embedding_dups": _COSINE_PAIRS_ORACLE,
            "op_cosine_topk": _TOPK_ORACLE,
            "op_quantize_embeddings": _QUANTIZE_ORACLE,
            "op_quantized_topk": _TOPK_ORACLE,
            "op_knn_grouped": _KNN_ORACLE,
            "op_knn_skew": _KNN_ORACLE,
            "op_stream_windowed": _STREAM_WINDOWED_ORACLE,
            "op_stream_sink_upsert": _STREAM_SINK_ORACLE,
            "op_multimodal_decode": _png_decode_oracle(),
            "op_multimodal_audio": _wav_decode_oracle(),
            "op_stream_near_dup": _stream_near_dup_oracle(),
            # two-batch incremental == single-shot bucket twin (batch-2
            # ids all above batch-1, so keepers coincide)
            "op_near_dup_incremental": _stream_near_dup_oracle(),
            "op_curate_stream": _curate_stream_oracle(),
            "op_stream_sequence_detect": PQL_QUERIES["pql_sequence_detect"][1],
            "pql_series_fit_2lines": _fit2_oracle(),
            "op_stream_sessionize": _STREAM_SESSION_ORACLE,
            "op_stream_stateful": _STREAM_STATEFUL_ORACLE,
            "op_asof_join": _ASOF_ORACLE,
            "op_range_join": _RANGE_JOIN_ORACLE,
            "op_geo_join": _GEO_JOIN_ORACLE,
            "op_geo_join_scale": _geo_join_scale_oracle(),
            "op_hamming_dups": _HAMMING_ORACLE,
            "op_ngram_zipf_prefix": _NGRAM_ZIPF_ORACLE,
            # stream-stream interval join produces the same pairs as the
            # batch range join over the identical window
            "op_stream_interval_join": _RANGE_JOIN_ORACLE,
            "op_stream_dedup": (
                "SELECT user_id, count(*) AS n,"
                " CAST(sum(event_id) AS BIGINT) AS sum_eid"
                " FROM (SELECT DISTINCT event_id, user_id FROM events)"
                " GROUP BY user_id"
            ),
            "op_kmv_distinct": _KMV_ORACLE,
            "op_winnow_fingerprints": _WINNOW_ORACLE,
            "op_sampling_split": _SAMPLING_ORACLE,
            "op_weighted_sample": _WSAMPLE_ORACLE,
            "op_mix_corpora": _MIX_ORACLE,
            "op_temperature_mix": _TMIX_ORACLE,
            "op_profile": _PROFILE_ORACLE,
            "op_histogram": _HISTOGRAM_ORACLE,
            "op_profile_grouped": _grouped_profile_oracle(),
            "op_unimax_mix": _UNIMAX_ORACLE,
            "op_lm_score": _LM_SCORE_ORACLE,
            "op_bm25": _bm25_oracle(),
            "op_line_dedup": _LINE_DEDUP_ORACLE,
            "op_crossdoc_dedup": _CROSSDOC_ORACLE,
            "op_scrub_crossdoc": _SCRUB_CROSSDOC_ORACLE,
            "op_importance_weights": _DSIR_ORACLE,
            # op_lsh_topk / op_multimodal_features: intentionally no oracle
            # (approximate result set / binary payloads) → rows-only check
        }
    )
    return out
