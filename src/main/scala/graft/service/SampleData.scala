package graft.service

import java.sql.Timestamp
import java.util.UUID
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded synthetic-data generator — the reference's
  * `create_sample_table` profiles (`icerunner.py:313-666`: analytics
  * `:331-377`, events `:381-457`, sales `:461-575`, iot `:579-641`,
  * default `:643-663`) reproduced with the **typed** schema the
  * reference declares but then loses (its int8/16/32 columns hit the
  * StringType fallback at `icerunner.py:128-131`; here they stay
  * ByteType/ShortType/IntegerType — SURVEY.md §1.2). Unlike the
  * reference (unseeded faker + random), generation is deterministic per
  * (profile, numRows, seed).
  */
object SampleData {

  private def ts(rnd: Random, now: Long, backDays: Int): Timestamp =
    // ms precision like the reference's timestamp[ms]
    new Timestamp(now - (rnd.nextDouble() * backDays * 86400000L).toLong)

  private def uuid(rnd: Random): String =
    new UUID(rnd.nextLong(), rnd.nextLong()).toString

  private def opt[A](rnd: Random, pNull: Double, v: => A): Any =
    if (rnd.nextDouble() < pNull) null else v

  private def pick(rnd: Random, xs: Seq[String]): String =
    xs(rnd.nextInt(xs.length))

  val profiles: Seq[String] = Seq("analytics", "events", "sales", "iot", "default")

  /** Build a sample DataFrame (reference: `create_sample_table`,
    * `icerunner.py:313-666`). */
  def create(spark: SparkSession, numRows: Int = 100,
      profile: String = "analytics", seed: Long = 42L): DataFrame = {
    val rnd = new Random(seed)
    val now = 1755000000000L // fixed epoch base: deterministic output
    profile match {
      case "analytics" => analytics(spark, rnd, now, numRows)
      case "events" => events(spark, rnd, now, numRows)
      case "sales" => sales(spark, rnd, now, numRows)
      case "iot" => iot(spark, rnd, now, numRows)
      case _ => default(spark, rnd, now, numRows)
    }
  }

  /** analytics (`icerunner.py:331-377`): web-visit facts. */
  private def analytics(spark: SparkSession, rnd: Random, now: Long, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("visitor_id", StringType, nullable = false),
      StructField("session_id", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("page_url", StringType, nullable = false),
      StructField("referrer", StringType, nullable = true),
      StructField("user_agent", StringType, nullable = true),
      StructField("device_type", StringType, nullable = true),
      StructField("country", StringType, nullable = true),
      StructField("city", StringType, nullable = true),
      StructField("browser", StringType, nullable = true),
      StructField("os", StringType, nullable = true),
      StructField("duration_seconds", IntegerType, nullable = true),
      StructField("page_views", ShortType, nullable = true),
      StructField("conversion", BooleanType, nullable = true)))
    val pages = Seq("/", "/products", "/pricing", "/blog", "/docs", "/about")
    val rows = (0 until n).map { _ =>
      val vid = uuid(rnd)
      Row(vid, s"${vid}_${now / 1000 - rnd.nextInt(86400)}",
        ts(rnd, now, 30), pick(rnd, pages),
        opt(rnd, 0.3, s"https://ref${rnd.nextInt(10)}.example.com"),
        opt(rnd, 0.1, s"Agent/${rnd.nextInt(100)}.0"),
        opt(rnd, 0.1, pick(rnd, Seq("desktop", "mobile", "tablet"))),
        opt(rnd, 0.1, pick(rnd, Seq("US", "DE", "JP", "BR", "IN"))),
        opt(rnd, 0.1, pick(rnd, Seq("Berlin", "Tokyo", "Austin", "Pune"))),
        opt(rnd, 0.1, pick(rnd, Seq("Chrome", "Firefox", "Safari", "Edge"))),
        opt(rnd, 0.1, pick(rnd, Seq("Windows", "MacOS", "Linux", "iOS", "Android"))),
        opt(rnd, 0.1, 5 + rnd.nextInt(1796)),
        opt(rnd, 0.1, (1 + rnd.nextInt(20)).toShort),
        opt(rnd, 0.1, rnd.nextDouble() < 0.1))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** events (`icerunner.py:381-457`): app/system events with JSON props. */
  private def events(spark: SparkSession, rnd: Random, now: Long, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", StringType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("user_id", StringType, nullable = true),
      StructField("device_id", StringType, nullable = true),
      StructField("ip_address", StringType, nullable = true),
      StructField("severity", StringType, nullable = true),
      StructField("component", StringType, nullable = true),
      StructField("message", StringType, nullable = true),
      StructField("properties", StringType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("status_code", ShortType, nullable = true)))
    val types = Seq("page_view", "click", "form_submit", "api_call", "error",
      "login", "logout")
    val rows = (0 until n).map { _ =>
      val et = pick(rnd, types)
      val timed = et == "api_call" || et == "form_submit"
      Row(uuid(rnd), et, ts(rnd, now, 7),
        opt(rnd, 0.2, s"user_${rnd.nextInt(500)}"),
        opt(rnd, 0.3, (0 until 6).map(_ => f"${rnd.nextInt(256)}%02x").mkString(":")),
        opt(rnd, 0.1, s"${rnd.nextInt(224)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"),
        opt(rnd, 0.1, pick(rnd, Seq("debug", "info", "warning", "error", "critical"))),
        opt(rnd, 0.1, pick(rnd, Seq("frontend", "backend", "database", "auth", "api", "cache", "scheduler"))),
        opt(rnd, 0.1, s"$et event"),
        opt(rnd, 0.5, s"""{"key1": ${rnd.nextInt(100)}, "key2": "${pick(rnd, Seq("a", "b", "c"))}"}"""),
        if (timed) Long.box(rnd.nextInt(5000).toLong) else null,
        if (et == "api_call") Short.box(pick(rnd, Seq("200", "201", "400", "404", "500")).toShort) else null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** sales (`icerunner.py:461-575`): order transactions. */
  private def sales(spark: SparkSession, rnd: Random, now: Long, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("order_id", StringType, nullable = false),
      StructField("customer_id", StringType, nullable = false),
      StructField("transaction_date", TimestampType, nullable = false),
      StructField("product_id", StringType, nullable = false),
      StructField("product_name", StringType, nullable = false),
      StructField("category", StringType, nullable = true),
      StructField("quantity", ShortType, nullable = false),
      StructField("unit_price", DoubleType, nullable = false),
      StructField("total_amount", DoubleType, nullable = false),
      StructField("payment_method", StringType, nullable = true),
      StructField("store_id", StringType, nullable = true),
      StructField("salesperson", StringType, nullable = true),
      StructField("promotion_code", StringType, nullable = true),
      StructField("is_returned", BooleanType, nullable = true)))
    // 8 fixed products (`icerunner.py:482-531`), 20 repeat customers (`:543`)
    val products = Seq(
      ("P001", "Laptop Pro", "Electronics", 1299.99),
      ("P002", "Wireless Mouse", "Electronics", 24.99),
      ("P003", "Office Chair", "Furniture", 189.50),
      ("P004", "Standing Desk", "Furniture", 449.00),
      ("P005", "Coffee Maker", "Appliances", 79.95),
      ("P006", "Notebook Set", "Stationery", 12.50),
      ("P007", "Monitor 27in", "Electronics", 329.99),
      ("P008", "Desk Lamp", "Furniture", 39.99))
    val customers = (0 until 20).map(_ => uuid(rnd))
    val rows = (0 until n).map { _ =>
      val (pid, pname, cat, price) = products(rnd.nextInt(products.length))
      val qty = (1 + rnd.nextInt(5)).toShort
      Row(uuid(rnd), customers(rnd.nextInt(customers.length)),
        ts(rnd, now, 90), pid, pname, opt(rnd, 0.1, cat), qty, price,
        math.rint(price * qty * 100) / 100,
        opt(rnd, 0.1, pick(rnd, Seq("credit_card", "debit_card", "paypal", "cash", "gift_card"))),
        opt(rnd, 0.1, f"S${1 + rnd.nextInt(5)}%03d"),
        opt(rnd, 0.1, s"rep_${rnd.nextInt(12)}"),
        opt(rnd, 0.7, s"PROMO${10 + rnd.nextInt(90)}"),
        opt(rnd, 0.1, rnd.nextDouble() < 0.05))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** iot (`icerunner.py:579-641`): sensor readings; keeps the int8/f32
    * widths the reference declares. */
  private def iot(spark: SparkSession, rnd: Random, now: Long, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("reading_id", StringType, nullable = false),
      StructField("device_id", StringType, nullable = false),
      StructField("sensor_type", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("unit", StringType, nullable = true),
      StructField("latitude", DoubleType, nullable = true),
      StructField("longitude", DoubleType, nullable = true),
      StructField("battery_level", FloatType, nullable = true),
      StructField("signal_strength", ByteType, nullable = true),
      StructField("alert_triggered", BooleanType, nullable = true),
      StructField("firmware_version", StringType, nullable = true)))
    val sensors = Seq( // type, unit, min, max, alert-above
      ("temperature", "celsius", -10.0, 45.0, 40.0),
      ("humidity", "percent", 0.0, 100.0, 90.0),
      ("pressure", "hPa", 950.0, 1050.0, 1040.0),
      ("air_quality", "ppm", 0.0, 500.0, 300.0),
      ("light", "lux", 0.0, 10000.0, 9000.0),
      ("noise", "dB", 30.0, 120.0, 100.0))
    val devices = (0 until 30).map(_ =>
      f"IOT-${pick(rnd, Seq("ABC", "DEF", "GHI"))}-${rnd.nextInt(10000)}%04d")
    val rows = (0 until n).map { _ =>
      val (st, unit, lo, hi, alert) = sensors(rnd.nextInt(sensors.length))
      val v = math.rint((lo + rnd.nextDouble() * (hi - lo)) * 100) / 100
      Row(uuid(rnd), devices(rnd.nextInt(devices.length)), st,
        ts(rnd, now, 3), v, opt(rnd, 0.1, unit),
        opt(rnd, 0.1, math.rint((-90 + rnd.nextDouble() * 180) * 1e6) / 1e6),
        opt(rnd, 0.1, math.rint((-180 + rnd.nextDouble() * 360) * 1e6) / 1e6),
        opt(rnd, 0.1, (math.rint(rnd.nextDouble() * 1000) / 10).toFloat),
        opt(rnd, 0.1, (-120 + rnd.nextInt(91)).toByte),
        opt(rnd, 0.1, v >= alert),
        opt(rnd, 0.1, pick(rnd, Seq("v1.0.0", "v1.1.0", "v1.2.3", "v2.0.1", "v2.1.0"))))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** default (`icerunner.py:643-663`). */
  private def default(spark: SparkSession, rnd: Random, now: Long, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("value", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("is_active", BooleanType, nullable = true)))
    val rows = (0 until n).map { i =>
      Row(i.toLong, s"sample_value_$i", ts(rnd, now, 7),
        opt(rnd, 0.1, rnd.nextBoolean()))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
