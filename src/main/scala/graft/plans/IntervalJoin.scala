package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.apache.spark.sql.GraftBridge

/** Native banded INTERVAL JOIN (|left.ts − right.ts| <= gap within the
  * same key) — the second custom physical operator, the temporal-pair
  * sibling of [[AsOfJoin]]. [[graft.ops.RangeJoin]] composes the same
  * semantics by duplicating each right row into its THREE candidate
  * time bands and equi-joining on (key, band) — 3× the right-side
  * shuffle volume and a post-join residual filter. This operator declares the
  * SortMergeJoin contract instead (clustered on key, sorted by
  * (key, ts) per side) and runs a forward merge holding a sliding
  * window of right rows: per partition, O(rows in one 2·gap window of
  * one key) state, each side read exactly once, no row duplication,
  * no residual filter.
  *
  * Matching contract (pinned by q43/q123's DuckDB IEJoin oracle):
  * inclusive band edges; INNER semantics (an unmatched left row emits
  * nothing); NULL keys and NULL timestamps never match. Both ts
  * columns must be timestamps (micros-as-long internally — the window
  * arithmetic is integer), and float/double keys are refused for the
  * same normalization reason as [[AsOfJoin]].
  *
  * PARALLELISM BOUND: children cluster on the JOIN KEY, so a hot key
  * serializes its merge into one task (pinned correct under a
  * 90%-hot key in AsOfSkewSpec) — the same bound as the composed
  * banded form, whose (key, band) equi-join AQE can at least
  * skew-split. When one key dominates AND its matches are sparse in
  * time, prefer [[graft.ops.RangeJoin.withinGap]] with AQE skew join:
  * its equi-join key (key, band) subdivides the hot key by time band,
  * trading 3× right-side duplication for band-grain parallelism.
  * Salting is unsound here for the same reason as the as-of carry:
  * a pair's two rows must meet in one partition.
  */
object IntervalJoin {

  case class IntervalJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute,
      gapMicros: Long,
      payload: Seq[Attribute],
      rightOut: Seq[AttributeReference]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ rightOut
    override def producedAttributes: AttributeSet = AttributeSet(rightOut)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object IntervalJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: IntervalJoinNode =>
        IntervalJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
          n.gapMicros, n.payload, n.rightOut, planLater(n.left),
          planLater(n.right)) :: Nil
      case _ => Nil
    }
  }

  /** Forward merge with a sliding right-row window. Left timestamps
    * are non-decreasing within a key, so a right row below the
    * current window (rTs < lTs − gap) is below every future window of
    * that key — evicted once, never revisited; rows above the window
    * stay unconsumed until a left row reaches them. Buffer state is
    * exactly the right rows inside one key's current 2·gap window —
    * the operator's working set is the join's local density, not the
    * partition.
    */
  case class IntervalJoinExec(
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute, gapMicros: Long,
      payload: Seq[Attribute], rightOut: Seq[AttributeReference],
      left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ rightOut

    override def producedAttributes: AttributeSet = AttributeSet(rightOut)

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(leftKeys),
        ClusteredDistribution(rightKeys))

    private def asc(e: Attribute) =
      SortOrder(e, Ascending, Ascending.defaultNullOrdering, Seq.empty)

    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq((leftKeys :+ leftTs).map(asc), (rightKeys :+ rightTs).map(asc))

    override def outputPartitioning: Partitioning =
      left.outputPartitioning

    // each left row's matches emit together, in left (key, ts) order
    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTs).map(asc)

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyAttrs = leftKeys
      val rKeyAttrs = rightKeys
      val lTsA = leftTs
      val rTsA = rightTs
      val payloadA = payload
      val outAttrs = output
      val rightOutA: Seq[Attribute] = rightOut
      val keyTypes = lKeyAttrs.map(_.dataType)
      val gap = gapMicros

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
        val lTsProj = UnsafeProjection.create(Seq(lTsA), lOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsA), rOut)
        val payloadProj = UnsafeProjection.create(rTsA +: payloadA, rOut)
        val outProj = UnsafeProjection.create(outAttrs, lOut ++ rightOutA)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private val buf =
            scala.collection.mutable.ArrayDeque.empty[(Long, UnsafeRow)]
          private var bufKey: UnsafeRow = _
          private var rNext: InternalRow =
            if (rIter.hasNext) rIter.next() else null
          private var pending: Iterator[InternalRow] = Iterator.empty

          private def advanceRight(): Unit =
            rNext = if (rIter.hasNext) rIter.next() else null

          // builds `pending` for one left row (possibly empty)
          private def fill(): Unit = {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTsRow = lTsProj(lRow)
            if (lKey.anyNull || lTsRow.isNullAt(0)) return
            val lTs = lTsRow.getLong(0)
            if (bufKey == null || lKey != bufKey) {
              buf.clear()
              bufKey = lKey.copy()
            }
            var advance = true
            while (advance && rNext != null) {
              val rKey = rKeyProj(rNext)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) advanceRight() // key already passed: discard
              else if (c == 0) {
                val rTsRow = rTsProj(rNext)
                if (rTsRow.isNullAt(0)) advanceRight() // never matches
                else {
                  val rTs = rTsRow.getLong(0)
                  if (rTs <= lTs + gap) {
                    // below the window now = below every future
                    // window (left ts is non-decreasing per key)
                    if (rTs >= lTs - gap)
                      buf.append((rTs, payloadProj(rNext).copy()))
                    advanceRight()
                  } else advance = false
                }
              } else advance = false
            }
            while (buf.nonEmpty && buf.head._1 < lTs - gap)
              buf.removeHead()
            if (buf.nonEmpty) {
              // snapshot: buf mutates only in later fill() calls, and
              // hasNext() only fills once pending is exhausted
              val snapshot = buf.toIndexedSeq
              pending = snapshot.iterator.map { case (_, p) =>
                outProj(joined(lRow, p))
              }
            }
          }

          override def hasNext: Boolean = {
            while (!pending.hasNext && lIter.hasNext) fill()
            pending.hasNext
          }

          override def next(): InternalRow = pending.next()
        }
      }
    }
  }

  /** Register the strategy on `spark` (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    // extraStrategies is a plain var: the contains/append pair must be
    // atomic or concurrent join() calls can lose a registration or
    // stack duplicates
    exp.synchronized {
      if (!exp.extraStrategies.contains(IntervalJoinStrategy))
        exp.extraStrategies = exp.extraStrategies :+ IntervalJoinStrategy
    }
  }

  /** Inner interval join: pairs of `left` × `right` rows sharing
    * `keys` with `|leftTs − rightTs| <= gapSeconds`; attaches
    * `band_<rightTs>` and `band_<c>` for each payload column — the
    * same surface as [[graft.ops.RangeJoin.withinGap]], planned
    * natively.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, gapSeconds: Long,
      rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val s = NativeJoinSides.resolve(left, right, keys, leftTs, rightTs,
      rightCols, "band_", "interval")
    // the window arithmetic reads micros-as-long: timestamps only
    Seq(s.lTs, s.rTs).foreach { t =>
      require(t.dataType == TimestampType ||
          t.dataType == TimestampNTZType,
        s"interval ts ${t.name} must be a timestamp, got ${t.dataType}")
    }
    require(gapSeconds >= 0, "gapSeconds must be non-negative")
    GraftBridge.ofRows(spark, IntervalJoinNode(
      s.lPlan, s.rPlan, s.lKeys, s.rKeys, s.lTs, s.rTs,
      gapSeconds * 1000000L, s.payload, s.rightOut))
  }
}
