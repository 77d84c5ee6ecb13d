"""Relational operator coverage on the TPC-H-ish harness tables.

SURVEY.md §2.6 notes the reference uses no sorts/limits/set-ops — they are
"Spark built-ins... listed so the inventory is complete". This module makes
that coverage concrete and oracle-checked: aggregations, multi-way joins,
sort/limit, UNION/INTERSECT/EXCEPT, ranking/analytic windows, ROLLUP,
semi/anti joins, correlated subqueries, scalar functions.

Engine-determinism rules (so Spark and the DuckDB oracle hash-match exactly):

- Never SUM doubles — summation order differs across engines/partitions.
  Cast to DECIMAL first (exact, associative); fixed output scale via CAST.
- Averages as CAST(SUM(decimal) AS DOUBLE)/COUNT(*) — one IEEE divide,
  bit-identical in both engines.
- Every ORDER BY under a LIMIT carries a unique tiebreaker column.
- Each query template is shared between Spark and DuckDB with dialect
  placeholders ({TS} timestamp literal prefix, {STR} string type).

Most queries run through ``spark.sql`` — the idiomatic path: Catalyst plans
them (broadcast joins for the small dims, partial aggregation, pushdown).
A few use the DataFrame API to exercise that surface too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_example_spark.tables import load_tables

# revenue = extendedprice * (1 - discount): exact decimal accumulation,
# DOUBLE at the output boundary (identical representation in both engines).
_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

TEMPLATES: dict[str, str] = {
    # A1/A2-class grouped aggregation with filter pushdown (TPC-H Q1 shape).
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               {_REV} AS sum_disc_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                             (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) *
                        (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= {{TS}} '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    # 3-way join + group + top-k (TPC-H Q3 shape; o_orderpriority stands in
    # for the missing o_shippriority column).
    "q3_shipping_priority": f"""
        SELECT l_orderkey, {_REV} AS revenue, o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < {{TS}} '1998-01-01 00:00:00'
          AND l_shipdate > {{TS}} '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    # 6-way join through the dimension chain (TPC-H Q5 shape).
    "q5_local_supplier_volume": f"""
        SELECT n_name, {_REV} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= {{TS}} '1996-01-01 00:00:00'
          AND o_orderdate < {{TS}} '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    # Pure filter + aggregate (TPC-H Q6 shape) — tests predicate pushdown.
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= {TS} '1996-01-01 00:00:00'
          AND l_shipdate < {TS} '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    # Global sort + limit with unique tiebreaker (§2.6 ORDER BY/LIMIT).
    "top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    # Set operations (§2.6): UNION (distinct), INTERSECT, EXCEPT.
    "set_union": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    "set_intersect": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "set_except": """
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
    # Ranking + analytic window functions (W-class beyond W1).
    "ranking_windows": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS pri_rank,
               DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS st_rank,
               LAG(o_orderkey) OVER w AS prev_orderkey,
               LEAD(o_orderkey) OVER w AS next_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    # Distribution window trio (ntile / percent_rank / cume_dist): the
    # quantile-bucketing analytics BI layers ship; unique tiebreaker makes
    # every peer group a singleton, so the rational outputs are one exact
    # integer division each in both engines.
    "distribution_ranks": """
        SELECT c_mktsegment, c_custkey,
               CAST(c_acctbal AS DOUBLE) AS acctbal,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    # ratio_to_report window: each order's share of its customer's total
    # (the percent-of-group analytic every BI layer ships).
    "ratio_to_report": """
        SELECT o_custkey, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               CAST(o_totalprice AS DOUBLE)
                 / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY o_custkey) AS DOUBLE) AS share
        FROM orders
    """,
    # Metric-layer period-over-period: monthly revenue with MoM delta
    # and growth ratio (lag window over the month grain).
    "period_over_period": """
        SELECT month, revenue,
               revenue - LAG(revenue) OVER w AS mom_delta,
               CASE WHEN LAG(revenue) OVER w > 0
                    THEN revenue / LAG(revenue) OVER w END AS mom_ratio
        FROM (
          SELECT date_trunc('month', o_orderdate) AS month,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
          FROM orders GROUP BY date_trunc('month', o_orderdate)
        )
        WINDOW w AS (ORDER BY month)
    """,
    # 2-D Pareto skyline (maximize price AND recency): the classic
    # dominance query, NOT a quadratic self-join — sort one dimension
    # descending and keep rows that beat the running max of the other
    # (one window pass; exact-duplicate points keep the smallest key).
    "pareto_orders": """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price, o_orderdate
        FROM (
          SELECT o_orderkey, o_totalprice, o_orderdate, du,
                 MAX(du) OVER (ORDER BY CAST(o_totalprice AS DOUBLE) DESC, du DESC,
                               o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_prev
          FROM (SELECT o_orderkey, o_totalprice, o_orderdate,
                       {EPOCH_US} AS du
                FROM orders)
        ) WHERE best_prev IS NULL OR du > best_prev
    """,
    # Pure theta (non-equi) join against an inline band dimension —
    # Catalyst plans BroadcastNestedLoopJoin (there is no equi key at
    # all), the join class equi/range templates never exercise.
    "theta_band_join": """
        SELECT b.band_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        FROM orders o
        JOIN (VALUES ('low', 0.0, 50000.0),
                     ('mid', 50000.0, 150000.0),
                     ('high', 150000.0, 1000000000.0)) AS b(band_name, lo, hi)
          ON CAST(o.o_totalprice AS DOUBLE) >= b.lo
         AND CAST(o.o_totalprice AS DOUBLE) < b.hi
        GROUP BY b.band_name
    """,
    # Distribution window trio (§2.4 extension): NTILE bucketing,
    # PERCENT_RANK and CUME_DIST — all exact integer-ratio doubles, and
    # identical SQL text in both engines.
    "distribution_windows": """
        SELECT o_custkey, o_orderkey,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY CAST(o_totalprice AS DOUBLE), o_orderkey)
    """,
    # ROLLUP grouping sets (§2.3 extension).
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    # Correlated LATERAL subquery with per-row ORDER BY + LIMIT — top-2
    # orders per customer (the per-group-top-k shape as a join, not a
    # window; Catalyst rewrites it to a ranked join under the hood).
    "lateral_top_orders": """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
    """,
    # Hypertable-style time-hierarchy rollup: one scan produces the counts
    # at hour, day, month, and grand-total grain (continuous-aggregate
    # maintenance is this same relation under incremental refresh).
    "time_rollup_counts": """
        SELECT date_trunc('month', ts) AS month,
               date_trunc('day', ts) AS day,
               date_trunc('hour', ts) AS hour,
               event_type, COUNT(*) AS n
        FROM events
        GROUP BY ROLLUP(date_trunc('month', ts), date_trunc('day', ts),
                        date_trunc('hour', ts)), event_type
    """,
    # Correlated scalar comparison via explicit per-key aggregate join —
    # orders 1.5x above their customer's mean order value.
    "orders_above_customer_avg": """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        JOIN (
            SELECT o_custkey AS ck,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS avg_price
            FROM orders GROUP BY o_custkey
        ) a ON o.o_custkey = a.ck
        WHERE o.o_totalprice > 1.5 * a.avg_price
    """,
    # Bilateral trade-volume shape (TPC-H Q7): two nation-dimension joins of
    # the same table, year extraction, decimal-exact revenue.
    "q7_nation_volume": f"""
        SELECT supp_nation, cust_nation, l_year, {_REV} AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
                 l_extendedprice, l_discount
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    # FILTER-clause aggregates (conditional counts/sums in one pass).
    "filtered_aggregates": """
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_value
        FROM orders
        GROUP BY o_orderpriority
    """,
    # Exact interpolated percentiles (verified bit-identical between Spark
    # PERCENTILE and DuckDB QUANTILE_CONT — same linear interpolation).
    "percentile_prices": """
        SELECT l_returnflag,
               {PCT}(l_extendedprice, 0.5) AS p50_price,
               {PCT}(l_extendedprice, 0.95) AS p95_price,
               {PCT}(l_quantity, 0.25) AS q1_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    # EXISTS-correlated aggregate (TPC-H Q4 shape).
    "q4_order_priority_check": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= {TS} '1996-01-01 00:00:00'
          AND o_orderdate < {TS} '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    # LEFT join + count distribution (TPC-H Q13 shape).
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    # Correlated scalar subquery with per-group MIN (TPC-H Q2 shape).
    "q2_min_price_parts": """
        SELECT p.p_type, p.p_partkey, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                                 WHERE p2.p_type = p.p_type)
    """,
    # Range (interval) join: equi key + time-band predicate — errors in the
    # hour before each purchase. Catalyst plans SMJ on the equi key with the
    # band as a post-join filter; at scale, bucketing by user co-locates it.
    "range_join_prior_errors": """
        SELECT p.event_id, COUNT(e.event_id) AS n_prior_errors
        FROM events p LEFT JOIN events e
          ON p.user_id = e.user_id AND e.event_type = 'error'
          AND e.ts > p.ts - INTERVAL 1 HOUR AND e.ts <= p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    """,
    # CTE (P5, App.java:201) + distinct aggregates.
    "cte_distinct_counts": """
        WITH shipped AS (
          SELECT l_partkey, l_suppkey, l_returnflag
          FROM lineitem
          WHERE l_shipdate >= {TS} '1996-01-01 00:00:00'
        )
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(*) AS n_rows
        FROM shipped
        GROUP BY l_returnflag
    """,
    # CUBE grouping sets (§2.3 extension beyond ROLLUP).
    "cube_order_counts": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    # Market-share shape (TPC-H Q8): conditional revenue share per year —
    # ratio of two decimal sums, single double divide at the boundary.
    "q8_market_share": """
        SELECT l_year,
               CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                                  THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                    / CAST(SUM(rev) AS DOUBLE) AS DOUBLE) AS mkt_share
        FROM (
          SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS l_year,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS rev,
                 n2.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        )
        GROUP BY l_year
    """,
    # Product-profit shape (TPC-H Q9; p_retailprice stands in for the absent
    # partsupp supply cost): profit by supplier nation x year.
    "q9_product_profit": """
        SELECT n_name AS nation, CAST(YEAR(l_shipdate) AS INTEGER) AS o_year,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                             (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                        - CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
                               CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%a%'
        GROUP BY n_name, YEAR(l_shipdate)
    """,
    # Returned-items top customers (TPC-H Q10 shape).
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, {_REV} AS revenue, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= {{TS}} '1996-01-01 00:00:00'
          AND o_orderdate < {{TS}} '1996-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    # Promo-revenue ratio (TPC-H Q14 shape): conditional sum / total sum.
    "q14_promo_revenue": """
        SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                               (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                               (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
               AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= {TS} '1996-03-01 00:00:00'
          AND l_shipdate < {TS} '1996-04-01 00:00:00'
    """,
    # Small-quantity-order revenue (TPC-H Q17 shape): correlated per-part
    # average quantity via explicit aggregate join.
    "q17_small_quantity_revenue": """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (
          SELECT l_partkey AS agg_pk,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*) AS DOUBLE) AS avg_qty
          FROM lineitem GROUP BY l_partkey
        ) a ON a.agg_pk = l_partkey
        WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * avg_qty
    """,
    # Large-volume customers (TPC-H Q18 shape): HAVING over a grouped join,
    # then top-k with unique tiebreaker.
    "q18_large_volume_customers": """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 120
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
    """,
    # Disjunctive multi-attribute predicates (TPC-H Q19 shape) — tests
    # OR-of-ANDs pushdown and join predicate extraction.
    "q19_disjunctive_revenue": f"""
        SELECT {_REV} AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 5 AND l_quantity <= 25)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 35)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    # Dormant high-balance customers (TPC-H Q22 shape): scalar-subquery
    # average + NOT EXISTS anti-correlation.
    "q22_dormant_customers": """
        SELECT c_mktsegment, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                       / COUNT(*) AS DOUBLE)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                          AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """,
    # Group-share HAVING over a scalar subquery (TPC-H Q11 shape; lineitem
    # supply value stands in for the absent partsupp table).
    "q11_important_stock": """
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > (
          SELECT 0.001 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                                  CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
        )
    """,
    # Two-level conditional counts per category (TPC-H Q12 shape;
    # l_linestatus stands in for the absent l_shipmode column).
    "q12_priority_by_status": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= {TS} '1996-01-01 00:00:00'
          AND l_shipdate < {TS} '1997-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    # Top supplier(s) via derived revenue view + scalar MAX (TPC-H Q15
    # shape) — ties all included, deterministic without a tiebreaker.
    "q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= {{TS}} '1996-01-01 00:00:00'
            AND l_shipdate < {{TS}} '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    # Distinct-supplier counts per part attribute with a NOT IN exclusion
    # subquery (TPC-H Q16 shape).
    "q16_parts_supplier_counts": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    # Nested-IN supplier qualification with a grouped HAVING threshold
    # (TPC-H Q20 shape): suppliers who moved real volume of 'a'-parts.
    "q20_volume_suppliers": """
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%a%'
            AND l_shipdate >= {TS} '1996-01-01 00:00:00'
            AND l_shipdate < {TS} '1997-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 100.0
        )
    """,
    # EXISTS + NOT EXISTS over self-joined lineitem (TPC-H Q21 shape):
    # suppliers solely responsible for returns in multi-supplier orders.
    "q21_sole_returner": """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
    """,
    # Event-time RANGE frame (W-class): per-user rolling 1-hour sums — the
    # time-interval window frame Spark and DuckDB both evaluate over peers.
    "time_range_window_sums": """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS hour_sum,
               COUNT(*) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS hour_n
        FROM events
    """,
    # Distribution analytics (W-class): NTILE / PERCENT_RANK / CUME_DIST /
    # FIRST_VALUE with fully-tiebroken ordering.
    "analytic_distribution": """
        SELECT l_orderkey, l_linenumber,
               NTILE(4) OVER w AS price_quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(l_orderkey) OVER w AS cheapest_order
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
    # Explicit GROUPING SETS with GROUPING() disambiguation (beyond the
    # ROLLUP/CUBE shorthands): three chosen aggregation levels in one pass.
    "grouping_sets_revenue": f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    # FULL OUTER join over year-partitioned aggregates: entities present in
    # either side survive with NULLs on the absent side.
    "full_outer_order_years": """
        SELECT COALESCE(a.ck, b.ck) AS custkey,
               a.n AS n_1996, b.n AS n_1997
        FROM (SELECT o_custkey AS ck, COUNT(*) AS n FROM orders
              WHERE o_orderdate >= {TS} '1996-01-01 00:00:00'
                AND o_orderdate < {TS} '1997-01-01 00:00:00' GROUP BY 1) a
        FULL OUTER JOIN
             (SELECT o_custkey AS ck, COUNT(*) AS n FROM orders
              WHERE o_orderdate >= {TS} '1997-01-01 00:00:00'
                AND o_orderdate < {TS} '1998-01-01 00:00:00' GROUP BY 1) b
          ON a.ck = b.ck
    """,
    # Consolidated set-operation suite (§2.6): UNION / INTERSECT / EXCEPT in
    # one tagged relation so a single driver-recorded row covers all three
    # (the individual variants stay in the extra registry for local checks).
    "set_ops_suite": """
        SELECT 'union' AS op, c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        UNION ALL
        SELECT 'intersect' AS op, c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
          INTERSECT
          SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        UNION ALL
        SELECT 'except' AS op, c_custkey FROM (
          SELECT c_custkey FROM customer
          EXCEPT
          SELECT o_custkey AS c_custkey FROM orders
        )
        UNION ALL
        SELECT 'intersect_all' AS op, c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
          INTERSECT ALL
          SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        UNION ALL
        SELECT 'except_all' AS op, c_custkey FROM (
          SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          EXCEPT ALL
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        )
    """,
    # Consolidated window-function suite (W-class): the ranking/lag/lead
    # block over orders and the NTILE/PERCENT_RANK/CUME_DIST block over
    # lineitem, padded to one tagged schema. BIGINT keys are cast to DOUBLE
    # for the shared value columns — exact below 2^53, so hash-safe.
    "window_suite": """
        SELECT 'rank' AS variant, o_custkey AS k1, o_orderkey AS k2,
               CAST(o_totalprice AS DOUBLE) AS v1,
               CAST(ROW_NUMBER() OVER w AS DOUBLE) AS v2,
               CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS DOUBLE) AS v3,
               CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS DOUBLE) AS v4,
               CAST(LAG(o_orderkey) OVER w AS DOUBLE) AS v5,
               CAST(LEAD(o_orderkey) OVER w AS DOUBLE) AS v6
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        UNION ALL
        SELECT 'dist' AS variant, l_orderkey AS k1, l_linenumber AS k2,
               CAST(NTILE(4) OVER w2 AS DOUBLE) AS v1,
               PERCENT_RANK() OVER w2 AS v2,
               CUME_DIST() OVER w2 AS v3,
               CAST(FIRST_VALUE(l_orderkey) OVER w2 AS DOUBLE) AS v4,
               CAST(NULL AS DOUBLE) AS v5,
               CAST(NULL AS DOUBLE) AS v6
        FROM lineitem
        WINDOW w2 AS (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
    # Consolidated grouping-set suite (§2.3): ROLLUP, CUBE, and explicit
    # GROUPING SETS with GROUPING() in one tagged relation.
    "grouping_suite": """
        SELECT 'rollup' AS variant, l_returnflag AS k1, l_linestatus AS k2,
               CAST(NULL AS INTEGER) AS g1, CAST(NULL AS INTEGER) AS g2,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS val
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS variant, o_orderstatus AS k1, o_orderpriority AS k2,
               CAST(NULL AS INTEGER) AS g1, CAST(NULL AS INTEGER) AS g2,
               COUNT(*) AS n, CAST(NULL AS DOUBLE) AS val
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        UNION ALL
        SELECT 'gsets' AS variant, o_orderstatus AS k1, o_orderpriority AS k2,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2,
               CAST(NULL AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS val
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    # Scalar expression breadth (P1/F-class): string/date/case/null functions.
    "scalar_functions": """
        SELECT o_orderkey,
               UPPER(o_orderpriority) AS pri_upper,
               SUBSTR(o_orderpriority, 1, 1) AS pri_code,
               CONCAT(CAST(o_orderkey AS {STR}), '-', o_orderstatus) AS tag,
               CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
               CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               CASE WHEN o_totalprice > 100000 THEN 'big'
                    WHEN o_totalprice > 10000 THEN 'mid'
                    ELSE 'small' END AS bucket,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open
        FROM orders
    """,
}


def render(name: str, dialect: str) -> str:
    return TEMPLATES[name].format(
        TS="TIMESTAMP_NTZ" if dialect == "spark" else "TIMESTAMP",
        STR="STRING" if dialect == "spark" else "VARCHAR",
        PCT="PERCENTILE" if dialect == "spark" else "QUANTILE_CONT",
        EPOCH_US=(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            if dialect == "spark"
            else "epoch_us(o_orderdate)"
        ),
    )


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(render(name, "spark"))


# --- DataFrame-API variants (exercise the non-SQL surface) ------------------


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one URGENT order — left_semi join."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import functions as F

    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left_anti join (NOT EXISTS)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted to one column per order status — the DataFrame
    ``pivot`` relational operator (plans into a single partial-aggregated
    exchange, same as a CASE-sum rollup). Status values are enumerated so
    the plan needs no pre-scan of the pivot column."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import functions as F

    statuses = ["F", "O", "P"]
    p = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
    )
    # pivot emits NULL for empty cells; normalize to 0 like the CASE oracle
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in statuses],
    )


def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (melt): per-returnflag count metrics pivoted
    into (l_returnflag, metric, value) rows via the DataFrame ``unpivot``
    operator — the inverse of ``pivot_status_counts``. Catalyst expands
    unpivot to a generator over the value columns, so the plan is the
    aggregation exchange plus a zero-shuffle expand."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import functions as F

    base = t["lineitem"].groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )
    return base.unpivot(
        ["l_returnflag"], ["n_rows", "n_parts", "n_supps"], "metric", "value"
    )


def semi_anti_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated left_semi + left_anti coverage: one tagged relation so a
    single driver-recorded row covers both DataFrame-API join types."""
    from pyspark.sql import functions as F

    semi = semi_join_customers(spark, sf_dir).withColumn("op", F.lit("semi"))
    anti = anti_join_customers(spark, sf_dir).withColumn("op", F.lit("anti"))
    return semi.unionByName(anti)


DF_ORACLES = {
    "semi_anti_suite": (
        "SELECT c_custkey, c_name, 'semi' AS op FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c.c_custkey "
        "AND o_orderpriority = '1-URGENT') "
        "UNION ALL "
        "SELECT c_custkey, c_name, 'anti' AS op FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)"
    ),
    "pivot_status_counts": (
        "SELECT o_orderpriority, "
        "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F, "
        "CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O, "
        "CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P "
        "FROM orders GROUP BY o_orderpriority"
    ),
    "unpivot_flag_metrics": (
        # DuckDB's SQL-standard UNPIVOT over the same wide aggregate
        "UNPIVOT (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps "
        "FROM lineitem GROUP BY l_returnflag) "
        "ON n_rows, n_parts, n_supps INTO NAME metric VALUE value"
    ),
    "semi_join_customers": (
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c.c_custkey "
        "AND o_orderpriority = '1-URGENT')"
    ),
    "anti_join_customers": (
        "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)"
    ),
}
