package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Q._

/** Second ring of the relational surface: multidimensional aggregation
  * (cube/grouping sets), exact and approximate distincts, percentiles,
  * batch sessionization, correlated subqueries, the TPC-H Q5-shaped
  * 6-way join, string distance, conditional aggregation, JSON
  * extraction — all admitted by the reference's passthrough surface
  * (SURVEY.md §2.3) and all first-class Spark built-ins.
  */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Q] = Seq(

    Q("q32_cube",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ${oSum("o_totalprice")} AS rev
               FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
               ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    Q("q33_percentiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5)  AS p50,
                quantile_cont(l_quantity, 0.75) AS p75
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q34_count_distinct",
      (s, d) => t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status")),
      Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts,
                COUNT(DISTINCT l_suppkey) AS n_supps,
                COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
              FROM lineitem""")),

    // HLL sketches are engine-specific (Spark's HLL++ vs DuckDB's HLL
    // never agree bit-for-bit), so the oracle is an ε-bound instead:
    // each engine asserts ITS approx lands within 5% of the exact
    // count. Spark runs at rsd=0.01 (1% std error), making the 5%
    // bound a ~5σ certainty; the exact counts pin the rest of the row.
    Q("q35_approx_distinct",
      (s, d) => {
        // exact and approx in SEPARATE one-row aggregations: mixing
        // countDistinct (planned via Expand, partials grouped by every
        // distinct key) with a low-rsd HLL would carry a ~16 KB sketch
        // buffer PER distinct-key group through the partial aggregate —
        // measured 12 s at sf0.1 vs <1 s split like this.
        // fanOut (round 18) on the EXACT branch only: its Expand ×2 +
        // distinct-key partial aggregate was fused into the
        // single-row-group scan (one core). The APPROX branch stays
        // scan-fused DELIBERATELY: the rsd=0.01 HLL partial carries a
        // 2×2731-word buffer whose per-task setup measured ~3.4 s
        // FIXED — fanned to 64 tasks it cost 216 s of task time
        // (probe, this round) vs 5 s unfanned; a wide fan-out
        // multiplies exactly the cost that doesn't shrink with rows.
        val li = t(s, d, "lineitem")
        val exact = fanOut(li.select("l_partkey", "l_orderkey"),
          "l_orderkey").agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        val approx = li.agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("__ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("__ao"))
        exact.crossJoin(approx)
          .select(col("exact_parts"), col("exact_orders"),
            (abs(col("__ap") - col("exact_parts")).cast("double")
              <= lit(0.05) * col("exact_parts")).as("parts_within_5pct"),
            (abs(col("__ao") - col("exact_orders")).cast("double")
              <= lit(0.05) * col("exact_orders")).as("orders_within_5pct"))
      },
      Some("""SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
                COUNT(DISTINCT l_orderkey) AS exact_orders,
                CAST(abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
                  AS DOUBLE) <= 0.05 * COUNT(DISTINCT l_partkey) AS parts_within_5pct,
                CAST(abs(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
                  AS DOUBLE) <= 0.05 * COUNT(DISTINCT l_orderkey) AS orders_within_5pct
              FROM lineitem""")),

    // relational pivot (long → wide): per-priority order counts split
    // by status column — Spark's pivot with an explicit value list
    // (no extra distinct-values job) ≡ FILTERed conditional counts
    Q("q51_pivot",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
                COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
                COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // approximate percentile sketch vs exact, q35-style ε-bound: the
    // sketches (Spark's KLL-ish vs DuckDB's t-digest) never agree
    // bit-for-bit, so each engine asserts ITS approx lands within one
    // quantity unit of ITS exact interpolated percentile; the exact
    // values pin the rest of the row. accuracy=1000 bounds rank error
    // to 0.1% of rows, far inside one unit of the 1..50 grid.
    Q("q52_approx_percentile",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val exact = li.agg(
          expr("percentile(l_quantity, 0.5)").as("exact_p50"),
          expr("percentile(l_quantity, 0.9)").as("exact_p90"))
        val approx = li.agg(
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("__a50"),
          expr("approx_percentile(l_quantity, 0.9, 1000)").as("__a90"))
        exact.crossJoin(approx)
          .select(col("exact_p50"), col("exact_p90"),
            (abs(col("__a50") - col("exact_p50")) <= 1.0).as("p50_within_1"),
            (abs(col("__a90") - col("exact_p90")) <= 1.0).as("p90_within_1"))
      },
      Some("""SELECT quantile_cont(l_quantity, 0.5) AS exact_p50,
                quantile_cont(l_quantity, 0.9) AS exact_p90,
                abs(approx_quantile(l_quantity, 0.5) - quantile_cont(l_quantity, 0.5))
                  <= 1.0 AS p50_within_1,
                abs(approx_quantile(l_quantity, 0.9) - quantile_cont(l_quantity, 0.9))
                  <= 1.0 AS p90_within_1
              FROM lineitem""")),

    // Batch sessionization: session_window ≡ the gaps-and-islands SQL
    // (new session when the gap since the previous event >= 30 min).
    Q("q36_sessionize",
      (s, d) => t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
        .orderBy("user_id"),
      Some("""WITH x AS (
                SELECT user_id,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s
                FROM events)
              SELECT user_id, CAST(1 + SUM(new_s) AS BIGINT) AS n_sessions,
                     COUNT(*) AS n_events
              FROM x GROUP BY user_id ORDER BY user_id""")),

    Q("q37_correlated_subquery",
      (s, d) => {
        val o = t(s, d, "orders")
        val avgs = o.groupBy(col("o_custkey").as("ck"))
          .agg(davg(col("o_totalprice")).as("cust_avg"))
        o.join(avgs, col("o_custkey") === col("ck"))
          .filter(col("o_totalprice") > col("cust_avg"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
               WHERE o_totalprice > (
                 SELECT ${oAvg("o2.o_totalprice")} FROM orders o2
                 WHERE o2.o_custkey = orders.o_custkey)
               ORDER BY o_orderkey""")),

    // TPC-H Q5-shaped: 6-way join, local-supplier condition, revenue
    // per nation within a region. Dims broadcast; fact side streams.
    Q("q38_regional_revenue",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val su = t(s, d, "supplier")
        val n = broadcast(t(s, d, "nation"))
        val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
            .cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
               ${oSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
               COUNT(*) AS n
               FROM lineitem
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
               JOIN nation   ON s_nationkey = n_nationkey
               JOIN region   ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'
               GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      headline = true),

    Q("q39_levenshtein",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          levenshtein(substring(col("p_name"), 1, 10), lit("promo brush"))
            .cast("long").as("dist"))
        .orderBy("p_partkey").limit(2000),
      Some("""SELECT p_partkey,
                CAST(levenshtein(SUBSTRING(p_name, 1, 10), 'promo brush') AS BIGINT) AS dist
              FROM part ORDER BY p_partkey LIMIT 2000""")),

    Q("q40_conditional_agg",
      (s, d) => t(s, d, "orders").agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0.0)).as("rev_f"),
        (count(when(col("o_totalprice") > 100000, 1)).cast("double") /
          count(lit(1))).as("big_order_ratio")),
      Some(s"""SELECT
                 COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                 COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                 ${oSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS rev_f,
                 CAST(COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS DOUBLE)
                   / COUNT(*) AS big_order_ratio
               FROM orders""")),

    Q("q41_json_extract",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id").limit(5000),
      Some("""SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events ORDER BY event_id LIMIT 5000""")),

    // lag/lead + range frame + ntile over the event stream
    Q("q42_window_lag_lead",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, d, "events").filter(col("user_id") < 30)
          .select(col("event_id"), col("user_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT event_id, user_id, value,
                LAG(value, 1) OVER w AS prev_value,
                LEAD(value, 1) OVER w AS next_value,
                CAST(NTILE(4) OVER w AS BIGINT) AS quartile
              FROM events WHERE user_id < 30
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
              ORDER BY user_id, event_id""")),

    // sliding average over a row frame (moving aggregate)
    Q("q43_window_moving_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-2, 0)
        t(s, d, "events").filter(col("user_id") < 30)
          .select(col("event_id"), col("user_id"),
            (sum(dec(col("value"), 2)).over(w).cast("double") /
              count(lit(1)).over(w)).as("moving_avg"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT event_id, user_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                  / COUNT(*) OVER w AS moving_avg
              FROM events WHERE user_id < 30
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id""")),

    // TPC-H Q7-shaped: bilateral volume between two nations by year
    Q("q48_nation_volume",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val su = t(s, d, "supplier")
        val n1 = broadcast(t(s, d, "nation"))
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = broadcast(t(s, d, "nation"))
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(n1, col("s_nationkey") === col("sk"))
          .join(n2, col("c_nationkey") === col("ck"))
          .filter((col("supp_nation") === "FRANCE" && col("cust_nation") === "GERMANY")
            || (col("supp_nation") === "GERMANY" && col("cust_nation") === "FRANCE"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
            .cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
                 ${oSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
               FROM lineitem
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
                  OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
               GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q15-shaped: argmax via scalar subquery over an aggregate
    Q("q49_top_supplier",
      (s, d) => {
        // fanOut on the groupBy key (round 18): the rev subtree runs
        // twice (scalar max + the filtered result) and both runs'
        // partial aggregates were scan-fused single-task — see Q.fanOut.
        val rev = fanOut(t(s, d, "lineitem"), "l_suppkey")
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
            .cast("double").as("total_revenue"))
        val maxRev = rev.agg(max(col("total_revenue"))).first().getDouble(0)
        rev.filter(col("total_revenue") === maxRev)
          .join(t(s, d, "supplier"), col("supplier_no") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
                 SELECT l_suppkey AS supplier_no,
                   ${oSum("l_extendedprice * (1.0 - l_discount)", 4)} AS total_revenue
                 FROM lineitem GROUP BY l_suppkey)
               SELECT s_suppkey, s_name, total_revenue
               FROM rev JOIN supplier ON supplier_no = s_suppkey
               WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
               ORDER BY s_suppkey""")),

    // TPC-H Q18-shaped: large orders via IN over a grouped HAVING
    Q("q50_large_orders",
      (s, d) => {
        // fanOut on the groupBy key (round 18) — see q10/Q.fanOut.
        val li = fanOut(t(s, d, "lineitem"), "l_orderkey")
        val big = li.groupBy("l_orderkey")
          .agg(dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250)
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
          .orderBy(col("total_qty").desc, col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice, total_qty
               FROM orders JOIN (
                 SELECT l_orderkey, ${oSum("l_quantity")} AS total_qty
                 FROM lineitem GROUP BY l_orderkey
                 HAVING ${oSum("l_quantity")} > 250) big
               ON o_orderkey = big.l_orderkey
               ORDER BY total_qty DESC, o_orderkey""")),

    // schema-on-read JSON parsing (from_json → typed struct) + agg
    // fanOut (round 18): per-row JSON parsing fused into the
    // single-task events scan — see Q.fanOut.
    Q("q46_from_json",
      (s, d) => fanOut(t(s, d, "events"), "event_id")
        .withColumn("k",
          from_json(col("props"), lit("k INT")).getField("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      // CAST(SUM(BIGINT) AS BIGINT): DuckDB widens integer SUM to
      // HUGEINT, which the driver's pandas compare hashes differently
      // from Spark's int64
      Some("""SELECT event_type,
                COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
                MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // null-handling scalars over rollup-produced nulls
    Q("q47_null_handling",
      (s, d) => t(s, d, "orders")
        .rollup("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"),
          when(col("o_orderstatus").isNull, "total")
            .otherwise("group").as("row_kind"),
          nullif(coalesce(col("o_orderstatus"), lit("F")), lit("F")).as("nullif_f"))
        .orderBy("status"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n,
                CASE WHEN o_orderstatus IS NULL THEN 'total' ELSE 'group' END AS row_kind,
                NULLIF(COALESCE(o_orderstatus, 'F'), 'F') AS nullif_f
              FROM orders GROUP BY ROLLUP(o_orderstatus) ORDER BY status""")),

    // first/last/nth value over an explicit full frame
    Q("q45_window_first_last",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events").filter(col("user_id") < 30)
          .select(col("event_id"), col("user_id"),
            first(col("value")).over(w).as("first_v"),
            last(col("value")).over(w).as("last_v"),
            nth_value(col("value"), 2).over(w).as("second_v"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT event_id, user_id,
                FIRST_VALUE(value) OVER w AS first_v,
                LAST_VALUE(value) OVER w AS last_v,
                NTH_VALUE(value, 2) OVER w AS second_v
              FROM events WHERE user_id < 30
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY user_id, event_id""")),

    // as-of (temporal) join: each purchase enriched with the user's
    // most recent prior view (AsOfJoin composition vs native ASOF JOIN)
    Q("q44_asof_join",
      (s, d) => {
        val e = t(s, d, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("v_ts"),
            col("event_id").as("view_id"))
        graft.operators.AsOfJoin.backward(purchases, views,
          "user_id", "ts", "v_ts", Map("view_id" -> "last_view_id"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
                   v AS (SELECT event_id AS view_id, user_id, ts FROM events
                         WHERE event_type = 'view')
              SELECT p.event_id, p.user_id, p.ts, v.view_id AS last_view_id
              FROM p ASOF LEFT JOIN v
                ON p.user_id = v.user_id AND p.ts >= v.ts
              ORDER BY p.event_id""")),

    // exact-dedup survivor selection as a query (window rn = 1)
    Q("d11_dedup_survivors",
      (s, d) => graft.operators.Dedup
        .exactSurvivors(t(s, d, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lower(text)
                         ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1
              ORDER BY doc_id"""))
  )
}
