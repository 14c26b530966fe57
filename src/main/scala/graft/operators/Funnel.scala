package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

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
            var lastTs: java.sql.Timestamp = null
            while (buf.hasNext && buf.head.get(0) == u) {
              val row = buf.next()
              if (reached < stageArr.length &&
                  row.getString(1) == stageArr(reached)) {
                val ts = row.getTimestamp(2)
                if (reached == 0 || ts.compareTo(lastTs) > 0) {
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
