package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** BOUNDED TOP-K AGGREGATE — per-group top-k as a native
  * `TypedImperativeAggregate` with map-side partial heaps, the scale
  * answer to "top-k per key" that the standard window formulation
  * cannot give: `row_number() OVER (PARTITION BY g ORDER BY ord)`
  * shuffles and SORTS every input row (the filter to k happens after
  * the exchange), while this aggregate trims to k inside each map
  * task, so the exchange carries at most k pairs per (group,
  * partition) and no sort ever touches the full data. For a
  * 100 TB corpus and k=10, that is the difference between shuffling
  * the corpus and shuffling kilobytes.
  *
  * Semantics: keeps the top-k (ord DESC, payload ASC) pairs —
  * the tie order is total because payloads are unique keys in every
  * engine use (doc ids), making the result deterministic and
  * oracle-exact against the window formulation. Monomorphic
  * (long, long) by design: scores quantize to integers everywhere in
  * this engine (the determinism policy), and a fixed-width buffer
  * serde (16 bytes per pair) keeps partial buffers cheap to ship.
  * Null ord or payload rows are skipped (a window's row_number would
  * rank nulls; callers filter nulls first — documented divergence).
  *
  * Runs in `ObjectHashAggregateExec` (partial → exchange → final),
  * which the q217 spec pins in the plan along with the exchange
  * sitting BETWEEN the two aggregate modes.
  */
case class TopKPairsF(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  require(k >= 1, s"topk: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType == LongType && payload.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk expects (BIGINT, BIGINT), got " +
          s"(${ord.dataType.simpleString}, ${payload.dataType.simpleString})")

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  /** Strict "ranks ahead of": ord DESC, payload ASC. */
  private def ahead(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(buf: mutable.ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(ahead).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null) {
      buf += ((o.asInstanceOf[Long], p.asInstanceOf[Long]))
      // amortized trim: the buffer never exceeds 4k entries
      if (buf.length >= 4 * k) trim(buf)
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[(Long, Long)],
      b2: mutable.ArrayBuffer[(Long, Long)])
      : mutable.ArrayBuffer[(Long, Long)] = {
    b1 ++= b2
    trim(b1)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    val kept = buf.sortWith(ahead).take(k)
    new GenericArrayData(
      kept.map { case (o, p) => InternalRow(o, p) }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)])
      : Array[Byte] = {
    val kept = buf.sortWith(ahead).take(k)
    val bb = ByteBuffer.allocate(4 + kept.length * 16)
    bb.putInt(kept.length)
    kept.foreach { case (o, p) => bb.putLong(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) {
      buf += ((bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairsF =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairsF =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(ord = c(0), payload = c(1))
  override def prettyName: String = "graft_topk"
}

object TopKPairsF {

  /** Column-level entry point: top-k (ord DESC, payload ASC) pairs. */
  def apply(ord: Column, payload: Column, k: Int): Column =
    GraftBridge.column(TopKPairsF(GraftBridge.expression(ord),
      GraftBridge.expression(payload), k).toAggregateExpression())
}
