package graft.operators

import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Shared predicates for adaptive physical-strategy choices. */
private[operators] object OpUtil {
  /** Ids the block-broadcast scorers can key on (cast-to-long safe). */
  def isIntegralId(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
}
