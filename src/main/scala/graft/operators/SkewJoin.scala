package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join split can't apply — e.g. aggregations keyed on a hot key,
  * or joins below AQE's size thresholds).
  *
  * The large (skewed) side gets a uniform random salt in [0, salt); the
  * small side is replicated `salt`× with every salt value; the join key
  * becomes (key, salt), splitting each hot key's rows across `salt`
  * reducers. Row-identical to the unsalted join (inner/left semantics
  * preserved; the salt column never escapes).
  *
  * 100 TB note: salt only the keys that need it — pass `hotKeys` to
  * limit replication to the skewed subset, leaving the long tail on the
  * plain path.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner",
      hotKeys: Option[DataFrame] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // replicating the small side is only row-preserving when unmatched
    // small-side rows cannot reach the output (each would appear salt x)
    require(Set("inner", "left", "leftouter", "left_outer", "cross")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    hotKeys match {
      case None =>
        val l = large.withColumn("__salt",
          (rand(seed = 42) * salt).cast("int"))
        val s = small.withColumn("__salt",
          explode(array((0 until salt).map(lit): _*)))
        l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
      case Some(hot) =>
        // split: hot keys take the salted path, the tail joins plainly
        val hotSet = hot.select(col(key)).distinct()
        val lHot = large.join(broadcast(hotSet), Seq(key), "left_semi")
        val lCold = large.join(broadcast(hotSet), Seq(key), "left_anti")
        val sHot = small.join(broadcast(hotSet), Seq(key), "left_semi")
        val sCold = small.join(broadcast(hotSet), Seq(key), "left_anti")
        saltedJoin(lHot, sHot, key, salt, joinType, None)
          .unionByName(lCold.join(sCold, Seq(key), joinType))
    }
  }
}
