package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered conversion funnel: the highest stage each user reached with
  * STRICTLY increasing timestamps — stage i counts only if an event of
  * `stages(i)`'s type happened after the time stage i-1 was reached
  * (first view, first click after that view, first purchase after that
  * click, ...).
  *
  * Scale shape: ONE hash exchange (repartition on the user key) followed
  * by a partition-local sort and a single-pass per-user state machine —
  * per-key state is O(|stages|) timestamps, NOT the user's event list.
  * The earlier formulation buffered every click/purchase timestamp of a
  * user in `collect_list` aggregation buffers; a 100 TB event log has
  * power users with millions of events, which makes that an OOM shape.
  * The sort replaces the buffers: events arrive in ts order, so "first
  * qualifying event after t" is the first match seen once t is set.
  */
object Funnel {

  /** @param stages event types in funnel order (first stage's min ts,
    *               then each subsequent type strictly after the prior
    *               stage's ts)
    * @return one row per user: (userCol, stageCol = stages reached,
    *         0..|stages|) */
  def ordered(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      stageCol: String = "stage"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val outSchema = StructType(Seq(
      df.schema(userCol).copy(name = userCol),
      StructField(stageCol, IntegerType, nullable = false)))
    val enc = Encoders.row(outSchema)
    val slim = df.select(col(userCol), col(typeCol), col(tsCol))
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
    val stageArr = stages.toArray
    // Resolve the micros extractor from the SCHEMA type, once, outside the
    // per-row loop. The external Row type of a timestamp depends on the
    // parquet logical type: TIMESTAMP (with tz) surfaces java.sql.Timestamp,
    // TIMESTAMP_NTZ surfaces java.time.LocalDateTime — getTimestamp() on the
    // latter throws ClassCastException. Comparing epoch-micros longs handles
    // both, avoids boxed compareTo in the hot loop, and is independent of the
    // session timezone (NTZ wall-clock is mapped at a fixed UTC offset; only
    // the ORDER matters here, and a fixed offset preserves it exactly).
    val micros: Row => Long = slim.schema(2).dataType match {
      case TimestampType => r => {
        val t = r.getTimestamp(2)
        // floorDiv, not /: getTime truncates toward zero, which for
        // pre-1970 instants would shift the second down-up and invert
        // ordering around the epoch (getNanos is always non-negative)
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      }
      case TimestampNTZType => r => {
        val t = r.getAs[java.time.LocalDateTime](2)
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
      }
      case DateType => r =>
        r.getAs[java.sql.Date](2).getTime * 1000L
      case LongType => _.getLong(2)
      case other => throw new IllegalArgumentException(
        s"funnel ts column '$tsCol' has unsupported type $other")
    }
    slim
      .repartition(col(userCol))
      .sortWithinPartitions(col(userCol), col(tsCol))
      .mapPartitions { it =>
        // rows arrive clustered by user and ts-sorted; each next() drains
        // one user's run with O(1) state
        val buf = it.buffered
        new Iterator[Row] {
          override def hasNext: Boolean = buf.hasNext
          override def next(): Row = {
            val u = buf.head.get(0)
            var reached = 0
            var lastTs = Long.MinValue
            while (buf.hasNext && buf.head.get(0) == u) {
              val row = buf.next()
              if (reached < stageArr.length &&
                  row.getString(1) == stageArr(reached)) {
                val ts = micros(row)
                if (reached == 0 || ts > lastTs) {
                  lastTs = ts
                  reached += 1
                }
              }
            }
            Row(u, reached)
          }
        }
      }(enc)
      .toDF(userCol, stageCol)
  }
}
