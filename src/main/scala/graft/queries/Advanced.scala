package graft.queries

import graft.{Q, T}
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, SkewJoin}

/** Advanced relational surface (SURVEY.md §2B rows the first batch left
  * implicit): temporal/as-of join, correlated subqueries, pivot,
  * lateral explode, grouping sets, window frames, ordered string
  * aggregation, interpolated percentiles, and a TPC-H-style multi-join.
  */
object Advanced {

  private def ql: Seq[Q] = Seq(

    // ---- backward as-of join (events → latest order-day stats) --------
    // Oracle is DuckDB's native ASOF LEFT JOIN; the Spark side is the
    // union+window single-shuffle formulation (operators.AsofJoin).
    Q("q40_asof_join",
      """WITH od AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS od,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    round(sum(o_totalprice), 2) AS day_price
        |  FROM orders GROUP BY 1)
        |SELECT e.event_id, o.od AS asof_day, o.n_orders, o.day_price
        |FROM events e ASOF LEFT JOIN od o ON e.ts >= o.od
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val od = T.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).as("od"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("day_price"))
        .withColumn("asof_day", col("od"))
      AsofJoin.backward(
        T.events(s, d).select("event_id", "ts"), od, "ts", "od")
        .select("event_id", "asof_day", "n_orders", "day_price")
        .orderBy("event_id")
    },

    // ---- EXISTS correlated subquery ------------------------------------
    Q("q41_exists_subquery",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T.customer(s, d).as("c")
        .join(T.orders(s, d).filter(col("o_totalprice") > 100000)
          .select("o_custkey").distinct().as("o"),
          col("c.c_custkey") === col("o.o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- NOT IN subquery (null-safe: key is non-null in testdata) ------
    Q("q42_not_in_subquery",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem
        |                        WHERE l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      T.part(s, d).as("p")
        .join(T.lineitem(s, d).filter(col("l_quantity") >= 45)
          .select("l_partkey").distinct().as("l"),
          col("p.p_partkey") === col("l.l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // ---- correlated scalar subquery (balance vs nation average) --------
    Q("q43_scalar_subquery",
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
        |  round((SELECT avg(c2.c_acctbal) FROM customer c2
        |         WHERE c2.c_nationkey = c.c_nationkey), 2) AS nation_avg
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c3.c_acctbal) FROM customer c3
        |                   WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = T.customer(s, d)
      val nationAvg = c.groupBy("c_nationkey")
        .agg(avg("c_acctbal").as("na"))
      c.join(nationAvg, "c_nationkey")
        .filter(col("c_acctbal") > col("na"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
          round(col("na"), 2).as("nation_avg"))
        .orderBy("c_custkey")
    },

    // ---- pivot (returnflag × linestatus quantity matrix) ---------------
    // Spark .pivot with explicit values; oracle is the portable
    // CASE-WHEN formulation (DuckDB's PIVOT syntax differs).
    Q("q44_pivot",
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS F,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum("l_quantity"))
        .na.fill(0.0, Seq("F", "O"))
        .select(col("l_returnflag"), round(col("F"), 2).as("F"),
          round(col("O"), 2).as("O"))
        .orderBy("l_returnflag")
    },

    // ---- unpivot (wide metrics back to long form) -----------------------
    // The inverse of q44: per-returnflag metric columns melted to
    // (metric, value) rows via Spark's native unpivot (melt) operator;
    // oracle is the portable UNION-ALL formulation.
    Q("q90_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS qty,
        |    round(sum(l_extendedprice), 2) AS price,
        |    round(avg(l_discount), 4) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'price', price FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'disc', disc FROM wide
        |ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("price"),
          round(avg("l_discount"), 4).as("disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    },

    // ---- lateral explode (words of p_type) -----------------------------
    Q("q45_lateral_explode",
      """SELECT w AS word, CAST(count(*) AS BIGINT) AS n
        |FROM part, unnest(string_split(p_type, ' ')) AS t(w)
        |GROUP BY w ORDER BY w""".stripMargin) { (s, d) =>
      T.part(s, d)
        .select(explode(split(col("p_type"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word")
    },

    // ---- GROUPING SETS (finer than rollup/cube) ------------------------
    Q("q46_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |  count(*) AS n, round(sum(o_totalprice), 2) AS total
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // ---- window frame (3-row moving sum per customer) ------------------
    // moving SUM, not avg: both engines fold the same 3 doubles in frame
    // order → bit-identical; windowed avg differs in accumulation
    // (sum/count vs incremental mean) at half-cent rounding boundaries.
    Q("q47_window_frame",
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          round(sum("o_totalprice").over(w), 2).as("moving_sum"))
        .orderBy("o_orderkey")
    },

    // ---- ordered string aggregation ------------------------------------
    Q("q48_string_agg",
      """SELECT c_mktsegment, string_agg(DISTINCT c_name, ',' ORDER BY c_name) AS names
        |FROM (SELECT c_mktsegment, c_name FROM customer WHERE c_custkey <= 50) t
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      T.customer(s, d).filter(col("c_custkey") <= 50)
        .groupBy("c_mktsegment")
        .agg(array_join(array_sort(collect_set("c_name")), ",").as("names"))
        .orderBy("c_mktsegment")
    },

    // ---- interpolated percentiles --------------------------------------
    Q("q49_percentiles",
      """SELECT l_returnflag,
        |  round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS p50,
        |  round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
        .orderBy("l_returnflag")
    },

    // ---- batch sessionization (30-min gap) -----------------------------
    // The batch twin of streaming.EventStreams.userSessions: lag-gap
    // flag → running session index → per-session bounds. One shuffle on
    // user_id; both window passes reuse the same partitioning.
    Q("q54_sessionize",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN date_diff('second',
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  min(ts) AS sess_start, max(ts) AS sess_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prev = lag(col("ts"), 1).over(byUser)
      T.events(s, d)
        .withColumn("new_sess",
          when(prev.isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(prev)) > 1800, 1)
            .otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(min("ts").as("sess_start"), max("ts").as("sess_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "sess_id")
    },

    // ---- multiset set-ops (ALL variants keep duplicates) ---------------
    Q("q57_set_ops_all",
      """SELECT custkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |  INTERSECT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) t GROUP BY custkey ORDER BY custkey""".stripMargin) { (s, d) =>
      val o = T.orders(s, d)
      val big = o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("custkey"))
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      big.intersectAll(f).exceptAll(urgent)
        .groupBy("custkey").agg(count(lit(1)).as("n"))
        .orderBy("custkey")
    },

    // ---- FILTER-clause aggregation (per-condition partial aggs) --------
    Q("q58_filtered_agg",
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  round(sum(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2) AS big_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          round(sum(when(col("o_totalprice") > 100000, col("o_totalprice"))), 2)
            .as("big_total"))
        .orderBy("o_orderpriority")
    },

    // ---- lead/lag with defaults across a partition ---------------------
    Q("q59_lead_lag",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1, -1) OVER w AS prev_order,
        |  lead(o_orderkey, 1, -1) OVER w AS next_order,
        |  CAST(coalesce(date_diff('day',
        |    lag(o_orderdate) OVER w, o_orderdate), -1) AS BIGINT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1, -1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1, -1).over(w).as("next_order"),
          coalesce(datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)),
            lit(-1)).cast("long").as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- approximate distinct counting (HLL++, invariant-graded) -------
    // Spark's HLL++ and DuckDB's sketch give different estimates, so the
    // estimate itself can't hash-match — instead the query computes the
    // EXACT distinct count alongside the sketch in the same aggregate
    // and emits the error-bound verdict the oracle states literally
    // (q84/q85 pattern): |hll − exact| / exact ≤ 0.05 at rsd = 0.02
    // (measured ≤ 0.0103 at both SFs — 5× of slack). A sketch
    // regression flips the boolean and hash-mismatches. The exact count
    // doubles as a hash-graded distinct-agg row.
    // Spec anchor retained: AdvancedSpec "approx_count_distinct lands
    // within 5% of the exact count per group".
    Q("q56_approx_distinct",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  count(*) AS n, TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("__approx") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.05).as("within_5pct"))
        .orderBy("l_returnflag")
    },

    // ---- TPC-H Q5-style 5-way join (revenue by nation) -----------------
    // Plan check: region/nation broadcast; lineitem⋈orders⋈customer
    // shuffle on their keys; one final hash-agg.
    Q("q50_multi_join",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("n_name")
    },

    // ---- salted skew join (row-identical to the plain join) ----------
    // The manual hot-key mitigation for when AQE's skew split can't
    // apply; graded against the UNSALTED oracle join to prove salting
    // never changes results. Hot keys = the top-20 order keys by line
    // count, so both the salted and plain paths execute.
    Q("q61_salted_join",
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |  round(sum(l.l_extendedprice), 2) AS gross
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
      val li = T.lineitem(s, d)
      val hot = li.groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_orderkey")).limit(20)
        .select("l_orderkey")
      val orders = T.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      SkewJoin.saltedJoin(li, orders, "l_orderkey", salt = 8,
          hotKeys = Some(hot))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("gross"))
        .orderBy("o_orderpriority")
    },

    // ---- q124: interval join without a nested-loop plan ----------------
    // Attach every event to each ±1 h promotional window around selected
    // purchase events. The declarative BETWEEN join has no equi-key —
    // Catalyst can only nested-loop it — so RangeJoin.intervalJoin
    // quantizes the time axis into 1 h buckets and plans a plain
    // equi-join (PlanSpec pins that the naive form nested-loops and this
    // form does not). DuckDB executes its own IEJoin for the oracle; the
    // hash compare proves the bucketed rewrite loses/duplicates nothing.
    Q("q124_interval_join",
      """WITH w AS (
        |  SELECT event_id AS window_id,
        |    ts - INTERVAL 1 HOUR AS ws, ts + INTERVAL 1 HOUR AS we
        |  FROM events WHERE event_type = 'purchase' AND event_id % 37 = 0)
        |SELECT e.event_id, e.event_type, w.window_id
        |FROM events e JOIN w ON e.ts BETWEEN w.ws AND w.we
        |ORDER BY e.event_id, w.window_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).select("event_id", "event_type", "ts")
      val w = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 37 === 0)
        .select(col("event_id").as("window_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("ws"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
      val micros = (c: org.apache.spark.sql.Column) =>
        unix_micros(c.cast("timestamp"))
      graft.operators.RangeJoin.intervalJoin(
          ev, micros(col("ts")), w, micros(col("ws")), micros(col("we")),
          bucketWidth = 3600L * 1000000L)
        .select("event_id", "event_type", "window_id")
        .orderBy("event_id", "window_id")
    })

  def queries: Seq[Q] = ql
}
