package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import Oracle._

/** Second tier of analytic operators: pivot, conditional aggregation,
  * moment-based variance, ordered collects, offset pagination, fuzzy string
  * matching, skew-safe salted aggregation, range-frame rolling windows,
  * ntile, median.
  *
  * Scale notes: the salted aggregate is the canonical hot-key mitigation
  * (pre-aggregate on (key, salt) before the final shuffle on key); the
  * rolling window shuffles once on the partition key with a value-range
  * frame (no unbounded state); pivot is a single partial+final aggregate
  * with a fixed column set (never pivot on unbounded cardinality).
  */
object AnalyticsExt {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Pivot: order counts per priority x status (fixed status domain).
    "pivot_status" -> { (s, d) =>
      Tables(s, d).orders
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P")) // empty cells: match FILTER's 0
        .orderBy("o_orderpriority")
    },
    // Conditional aggregation (FILTER-clause semantics).
    "agg_filtered" -> { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_quantity") >= 25, 1)).as("n_heavy"),
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
          dsum(when(col("l_tax") > 0.04, col("l_extendedprice"))
            .otherwise(lit(0.0))).as("taxed_price"))
        .orderBy("l_returnflag")
    },
    // Sample variance/stddev from exact moments (explicit formula on both
    // engines — built-in var_samp uses Welford and would diverge bitwise).
    "agg_variance" -> { (s, d) =>
      val n = count(lit(1)).cast(DoubleType)
      val sm = sum(col("l_quantity").cast(DecimalType(28, 6))).cast(DoubleType)
      val sq = sum((col("l_quantity") * col("l_quantity"))
        .cast(DecimalType(28, 6))).cast(DoubleType)
      Tables(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(((sq - (sm * sm) / n) / (n - lit(1.0))).as("var_qty"),
          sqrt((sq - (sm * sm) / n) / (n - lit(1.0))).as("stddev_qty"))
        .orderBy("l_returnflag")
    },
    // Ordered distinct collect, rendered as a joined string (list-typed
    // output would differ between engines only in arrow field metadata).
    "collect_sorted" -> { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          concat_ws(",", sort_array(collect_set(col("l_linestatus"))))
            .as("statuses"),
          concat_ws(",", transform(
            sort_array(collect_set(col("l_suppkey") % 10)),
            x => x.cast("string"))).as("supp_mod"))
        .orderBy("l_returnflag")
    },
    // Offset pagination under a total order.
    "sort_offset" -> { (s, d) =>
      Tables(s, d).orders
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(10)
        .limit(20)
    },
    // Fuzzy matching: Levenshtein-close nation-name pairs.
    "fuzzy_nation_pairs" -> { (s, d) =>
      val n1 = Tables(s, d).nation
        .select(col("n_nationkey").as("k1"), col("n_name").as("name1"))
      val n2 = Tables(s, d).nation
        .select(col("n_nationkey").as("k2"), col("n_name").as("name2"))
      n1.crossJoin(n2)
        .filter(col("k1") < col("k2"))
        .select(col("k1"), col("k2"),
          levenshtein(col("name1"), col("name2")).as("dist"))
        .filter(col("dist") <= 4)
        .orderBy("k1", "k2")
    },
    // Skew-safe aggregation: pre-aggregate on (key, salt), then final on key
    // — identical result to the direct aggregate (decimal sums re-associate
    // exactly), halving the data volume entering the hot-key shuffle.
    "agg_salted" -> { (s, d) =>
      val salted = Tables(s, d).lineitem
        .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(col("l_extendedprice").cast(DecimalType(28, 6))).as("ps"),
          count(lit(1)).as("pc"))
      salted.groupBy("l_returnflag")
        .agg(sum(col("ps")).cast(DoubleType).as("sum_price"),
          sum(col("pc")).as("n"))
        .orderBy("l_returnflag")
    },
    // 30-day rolling revenue per customer (value-range window frame).
    "window_rolling_30d" -> { (s, d) =>
      val dayNum = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
      val w = Window.partitionBy("o_custkey").orderBy("day_num")
        .rangeBetween(-30, 0)
      Tables(s, d).orders
        .withColumn("day_num", dayNum)
        .withColumn("rolling_30d",
          sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w)
            .cast(DoubleType))
        .select("o_custkey", "o_orderkey", "day_num", "rolling_30d")
        .orderBy("o_custkey", "o_orderkey")
    },
    // Quartile assignment within each order status.
    "ntile_quartiles" -> { (s, d) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables(s, d).orders
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("o_orderstatus", "quartile")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus", "quartile")
    },
    // Custom TypedImperativeAggregate: exact top-5 order prices per status
    // (O(k) state, partial-merge heaps — the sketch-aggregation shape).
    "agg_topk_custom" -> { (s, d) =>
      import graft.functions.aggregates.topk_doubles
      val top = Tables(s, d).orders
        .groupBy("o_orderstatus")
        .agg(topk_doubles(col("o_totalprice"), 5).as("top5"))
      // try_element_at: a group with fewer than 5 rows yields NULLs (like
      // the oracle's xs[i]); plain element_at would throw under ANSI mode
      top.select(col("o_orderstatus") +:
          (1 to 5).map(i => try_element_at(col("top5"), lit(i)).as(s"p$i")): _*)
        .orderBy("o_orderstatus")
    },
    // Approximate sketches: HLL distinct count + approximate median.
    // Engine-specific sketch internals → rows-only driver check; the spec
    // asserts closeness to the exact values.
    "agg_approx_sketch" -> { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_ndv"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
            .as("approx_median"))
        .orderBy("l_returnflag")
    },
    // Exact median of integer-valued quantities (interpolation lands on
    // exact halves — engine-portable).
    "agg_median" -> { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("median_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy("l_returnflag")
    }
  )

  def oracles: Map[String, String] = Map(
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin,
    "agg_filtered" ->
      s"""SELECT l_returnflag,
         |  count(*) FILTER (WHERE l_quantity >= 25) AS n_heavy,
         |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
         |  ${sqlSum("CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END")}
         |    AS taxed_price
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "agg_variance" ->
      """WITH m AS (SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sm,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |      AS sq
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  (sq - (sm * sm) / n) / (n - 1.0) AS var_qty,
        |  sqrt((sq - (sm * sm) / n) / (n - 1.0)) AS stddev_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "collect_sorted" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',')
        |    AS statuses,
        |  array_to_string(list_transform(
        |    list_sort(list_distinct(list(l_suppkey % 10))),
        |    x -> CAST(x AS VARCHAR)), ',') AS supp_mod
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "sort_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 10""".stripMargin,
    "fuzzy_nation_pairs" ->
      """SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
        |  CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
        |FROM nation a, nation b
        |WHERE a.n_nationkey < b.n_nationkey
        |  AND levenshtein(a.n_name, b.n_name) <= 4
        |ORDER BY k1, k2""".stripMargin,
    "agg_salted" ->
      s"""SELECT l_returnflag, ${sqlSum("l_extendedprice")} AS sum_price,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "window_rolling_30d" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', DATE '1990-01-01',
        |    CAST(o_orderdate AS DATE)) AS INT) AS day_num,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rolling_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "ntile_quartiles" ->
      s"""WITH t AS (SELECT o_orderstatus, o_totalprice,
         |    CAST(ntile(4) OVER (PARTITION BY o_orderstatus
         |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS INT) AS quartile
         |  FROM orders)
         |SELECT o_orderstatus, quartile, count(*) AS n,
         |  ${sqlSum("o_totalprice")} AS sum_price
         |FROM t GROUP BY o_orderstatus, quartile
         |ORDER BY o_orderstatus, quartile""".stripMargin,
    "agg_topk_custom" ->
      """WITH l AS (SELECT o_orderstatus,
        |    list(o_totalprice ORDER BY o_totalprice DESC) AS xs
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, xs[1] AS p1, xs[2] AS p2, xs[3] AS p3,
        |  xs[4] AS p4, xs[5] AS p5
        |FROM l ORDER BY o_orderstatus""".stripMargin,
    "agg_median" ->
      """SELECT l_returnflag, median(l_quantity) AS median_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin
  )
}
