package graft.queries

import graft.{Q, Tables}
import graft.Q.{dsum2, dsum4, sqlSum2, sqlSum4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reference-parity capability suite (SURVEY.md §2b) plus the relational
  * completions (§2c), each as an idiomatic Spark plan with a DuckDB oracle.
  *
  * The reference's API is one round of `flatMap → groupByKey(sorted) →
  * flatMapGroups`; every query here is a classical derived operator of that
  * surface (Dean & Ghemawat, OSDI 2004, §2.3), re-expressed declaratively so
  * Catalyst handles pushdown/pruning/join-strategy selection.
  *
  * Scale notes (100 TB design point): all aggregations are hash-aggregates
  * with map-side partials; all dimension joins broadcast the small side
  * explicitly; no query collects to the driver; sorts are range-partitioned;
  * top-k is a windowed rank pushed below the final projection.
  */
object Core {

  /** q01 — the reference's own golden workload (SampleClient.cpp:32-66):
    * character frequency count, as explode → hash-aggregate.
    */
  val charCount = Q(
    "q01_char_count",
    (s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), "")).as("c"))
        .where(col("c") =!= "")
        .groupBy("c")
        .agg(count(lit(1)).as("cnt"))
    },
    Some("""SELECT c, count(*) AS cnt FROM (
              SELECT unnest(string_split(text, '')) AS c FROM documents) t
            GROUP BY c""")
  )

  /** q02 — selection + projection; predicate and column pruning reach the
    * parquet scan (PushedFilters in .explain).
    */
  val filterProject = Q(
    "q02_filter_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1995-01-01' AND l_discount > 0.05""")
  )

  /** q03 — grouped aggregation, TPC-H Q1 flavor: sum/avg/min/max/count +
    * exact distinct count. Partial (map-side) aggregation is automatic.
    */
  val groupAgg = Q(
    "q03_group_agg",
    (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (dsum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("count_order")),
    Some(s"""SELECT l_returnflag, l_linestatus,
             ${sqlSum2("l_quantity")} AS sum_qty,
             ${sqlSum2("l_extendedprice")} AS sum_base_price,
             ${sqlSum4("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${sqlSum2("l_quantity")} / count(*) AS avg_qty,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             count(DISTINCT l_suppkey) AS n_supp,
             count(*) AS count_order
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '2000-09-02'
             GROUP BY l_returnflag, l_linestatus""")
  )

  /** q04 — distinct (the map=emit-key / reduce=emit-once encoding, §2b). */
  val distinctQ = Q(
    "q04_distinct",
    (s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct(),
    Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")
  )

  /** q05 — reduce-side equi-join + aggregation. No broadcast hint on
    * customer: unlike nation/region (fixed 25/5 rows at any scale),
    * customer GROWS with the scale factor — forcing it to broadcast
    * would OOM at 100 TB. The planner broadcasts it on its own while its
    * size estimate is under the threshold and shuffle-joins beyond.
    */
  val joinAgg = Q(
    "q05_join_agg",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total_price"))
    },
    Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
             ${sqlSum2("o_totalprice")} AS total_price
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY c_mktsegment""")
  )

  /** q06 — multi-way dimension join (star-schema), all small sides broadcast. */
  val joinMulti = Q(
    "q06_join_multi",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), dsum2(col("c_acctbal")).as("sum_acctbal"))
    },
    Some(s"""SELECT r_name, n_name, count(*) AS n_customers,
             ${sqlSum2("c_acctbal")} AS sum_acctbal
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name""")
  )

  /** q07 — left-semi join (EXISTS encoding of §2b). */
  val semiJoin = Q(
    "q07_semi_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).where(col("o_totalprice") > 200000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""")
  )

  /** q08 — left-anti join (NOT EXISTS). */
  val antiJoin = Q(
    "q08_anti_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")
  )

  /** q09 — union + distinct (bag concatenation, §2b). */
  val unionQ = Q(
    "q09_union",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.union(p).distinct()
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey FROM supplier""")
  )

  /** q10 — global sort + limit (range-partitioned sort; ties broken by key
    * so the limit is deterministic).
    */
  val sortLimit = Q(
    "q10_sort_limit",
    (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")
  )

  /** q11 — grouped top-k via window rank (no global sort, no collect). */
  val topkWindow = Q(
    "q11_topk_window",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t WHERE rn <= 3""")
  )

  /** q12 — group-collect (inverted-index idiom, §2b): set collected then
    * sorted and joined so the value is order-deterministic.
    */
  val groupCollect = Q(
    "q12_group_collect",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n")),
    Some("""SELECT o_orderpriority,
            array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
            count(*) AS n
            FROM orders GROUP BY o_orderpriority""")
  )

  /** q13 — rollup (grouping-sets family). */
  val rollupQ = Q(
    "q13_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("sum_qty")),
    Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
             ${sqlSum2("l_quantity")} AS sum_qty
             FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")
  )

  /** q14 — cube. */
  val cubeQ = Q(
    "q14_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("sum_price")),
    Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             ${sqlSum2("o_totalprice")} AS sum_price
             FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")
  )

  /** q15 — window functions: rank / lag / lead / running sum over an
    * order-deterministic frame.
    */
  val windowFuncs = Q(
    "q15_window_funcs",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(
          col("o_orderkey"), col("o_custkey"),
          rank().over(w).cast("long").as("rnk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
    },
    Some("""SELECT o_orderkey, o_custkey,
            rank() OVER w AS rnk,
            lag(o_orderkey, 1) OVER w AS prev_orderkey,
            lead(o_orderkey, 1) OVER w AS next_orderkey,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              AS running_spend
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")
  )

  /** q16 — intersect / except set ops, tagged into one result. */
  val setOps = Q(
    "q16_setops",
    (s, d) => {
      val o = Tables.orders(s, d)
      val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
      val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
      y95.intersect(y96).withColumn("tag", lit("both"))
        .union(y95.except(y96).withColumn("tag", lit("only95")))
    },
    Some("""SELECT custkey, 'both' AS tag FROM (
              SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
              INTERSECT
              SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) a
            UNION ALL
            SELECT custkey, 'only95' AS tag FROM (
              SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
              EXCEPT
              SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) b""")
  )

  /** q17 — scalar string/math function surface (codegen'd built-ins). */
  val scalarFuncs = Q(
    "q17_scalar_funcs",
    (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        // concat (not concat_ws) to match the oracle's NULL semantics:
        // concat_ws silently drops NULL inputs AND the separator, DuckDB's
        // concat keeps the separator — a latent mismatch if the data ever
        // gains NULLs.
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        abs(col("p_retailprice") - 1000.0).as("price_dev"),
        floor(col("p_retailprice")).as("price_floor"),
        sqrt(col("p_size").cast("double")).as("size_sqrt"),
        (col("p_size") % 5).cast("long").as("size_mod")),
    Some("""SELECT p_partkey,
            upper(p_brand) AS brand_u,
            substr(p_name, 1, 8) AS name8,
            CAST(length(p_name) AS BIGINT) AS name_len,
            p_brand || ':' || p_type AS brand_type,
            abs(p_retailprice - 1000.0) AS price_dev,
            CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
            sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
            CAST(p_size % 5 AS BIGINT) AS size_mod
            FROM part""")
  )

  /** q18 — date/time function surface. */
  val dateFuncs = Q(
    "q18_date_funcs",
    (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        date_trunc("month", col("o_orderdate")).as("month_start")),
    Some("""SELECT o_orderkey,
            CAST(year(o_orderdate) AS BIGINT) AS yr,
            CAST(month(o_orderdate) AS BIGINT) AS mo,
            CAST(day(o_orderdate) AS BIGINT) AS dom,
            CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
            CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
            date_trunc('month', o_orderdate) AS month_start
            FROM orders""")
  )

  /** q19 — approximate distinct (HLL++), HASH-GATED via the
    * audit-boolean discipline (q103/q126, round-15 verdict task 1): the
    * HLL estimate itself is implementation-defined, but its CONTRACT is
    * not — so the query emits the exact distincts (portable) plus one
    * boolean per sketch that any conformant HLL++ at the default
    * rsd=0.05 must satisfy: estimate within 15% (3·rsd, integer-form
    * `20·|Δ| ≤ 3·exact`) of the exact cardinality. The oracle computes
    * the exacts and expects the booleans TRUE — a sketch regression now
    * fails the hash gate, not just a spec. Deterministic across runs:
    * HLL registers are max() folds, order-insensitive under Spark's
    * partial aggregation. The audit runs both paths (exact Expand +
    * sketch); production runs the sketch alone — q105 is the same
    * discipline applied to the profile operator.
    */
  val approxDistinct = Q(
    "q19_approx_distinct",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"))
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) * 20 <= col("exact_parts") * 3)
            .as("parts_ok"),
          (abs(col("ao") - col("exact_orders")) * 20 <= col("exact_orders") * 3)
            .as("orders_ok")),
    Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
            count(DISTINCT l_orderkey) AS exact_orders,
            TRUE AS parts_ok, TRUE AS orders_ok
            FROM lineitem""")
  )

  /** q161 — the TPC-H Q5 SHAPE (local-supplier volume): six tables — two
    * fact-sized (lineitem, orders) and four dimensions — joined through a
    * 5-hop chain with a region filter and an order-date year cut,
    * aggregated to per-nation revenue. The flagship join-ordering
    * exercise: declared as a flat chain of equi-joins and left for
    * Catalyst + AQE to order — the dimension filters (region = 'ASIA',
    * one order year) should cascade through broadcast joins and shrink
    * the fact side BEFORE the one real shuffle join (lineitem ⨝ orders),
    * with both date and region predicates pushed to the scans. Revenue
    * is `l_extendedprice × (1 − l_discount)` — both 2-decimal, product
    * exactly 4-decimal ⇒ dsum4 hash parity (the TPC-H money discipline).
    */
  val starRevenue = Q(
    "q161_star_revenue",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).where(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          Q.dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
    },
    Some(s"""SELECT n_name, count(*) AS n_items,
             ${Q.sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
             FROM customer
             JOIN orders ON c_custkey = o_custkey
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
             JOIN lineitem ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
             GROUP BY n_name""")
  )

  val all: Seq[Q] = Seq(
    charCount, filterProject, groupAgg, distinctQ, joinAgg, joinMulti,
    semiJoin, antiJoin, unionQ, sortLimit, topkWindow, groupCollect,
    rollupQ, cubeQ, windowFuncs, setOps, scalarFuncs, dateFuncs,
    approxDistinct, starRevenue)
}
