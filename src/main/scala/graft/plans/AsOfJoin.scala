package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.GraftBridge

/** Native AS-OF JOIN — the full custom-operator tier (logical node +
  * planner strategy + physical merge), for the one temporal primitive
  * Spark genuinely lacks: attach to each left row the LATEST right row
  * with `right.ts <= left.ts` in the same key group.
  *
  * [[graft.ops.AsOf]] composes the same semantics from built-ins
  * (union + keyed window) and remains the default per the preference
  * order. This operator exists because the composed form pays for what
  * it cannot express: it UNIONS both inputs into one stream, so the
  * single shuffle carries left+right together, the sort runs over the
  * union, and every left row materializes a null-padded right payload
  * before the window fills it. The dedicated physical operator keeps
  * the sides separate — each shuffles/sorts only itself (the exact
  * SortMergeJoin distribution contract) — and the merge is a forward
  * scan holding ONE buffered right row per partition: O(1) state, no
  * window machinery, no union row-width tax. Same exchange count, ~half
  * the shuffled bytes when the sides are comparable, and the output
  * streams (never collects).
  *
  * Matching contract (pinned by the q42/q119 oracle, DuckDB ASOF LEFT
  * JOIN `ON l.k = r.k AND l.ts >= r.ts`): inclusive `<=`; a NULL key
  * or NULL timestamp on either side never matches (SQL equality /
  * inequality semantics); unmatched left rows keep nulls; at equal
  * right timestamps the last row in (key, ts) order wins — the same
  * row the composed window's `last()` picks.
  *
  * PARALLELISM BOUND: both children cluster on the JOIN KEY, so one
  * pathological hot key serializes its entire merge into a single
  * task — the same bound as the composed window form, and inherent to
  * any per-key ordered semantics (a correct as-of must observe a
  * key's rows in timestamp order). Correctness under a 90%-hot key is
  * pinned in AsOfSkewSpec. Salting ([[graft.ops.Skew]]) is NOT sound
  * here: the latest-at-or-before carry crosses any salt boundary. If
  * one key genuinely outgrows a task, split its timeline into range
  * buckets and carry each bucket's last right row forward as a seed
  * (a per-bucket prefix pass over ~|buckets| rows), then as-of join
  * within buckets — the composed [[graft.ops.AsOf]] expresses that
  * shape over (key, bucket) sub-keys; at entity-grain keys (the
  * reference's workloads) no key approaches a task's capacity.
  */
object AsOfJoin {

  /** Logical placeholder the strategy below plans. Children arrive
    * ALREADY ANALYZED (the API builds from `queryExecution.analyzed`
    * with freshly-aliased right output, so self-joins cannot collide
    * on expression ids); `rightOut` carries the operator's minted
    * output attributes (nullable — it is a LEFT as-of).
    */
  case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute,
      payload: Seq[Attribute],
      rightOut: Seq[AttributeReference]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ rightOut
    // rightOut is minted BY this operator (the Generate pattern) —
    // without this, CheckAnalysis counts it as an unresolved reference
    override def producedAttributes: AttributeSet = AttributeSet(rightOut)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]; a no-op on every other
    * node, per the extraStrategies contract.
    */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: AsOfJoinNode =>
        AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
          n.payload, n.rightOut, planLater(n.left),
          planLater(n.right)) :: Nil
      case _ => Nil
    }
  }

  /** Physical merge as-of join. Declares the SortMergeJoin contract —
    * both children clustered on the key and sorted by (key, ts) — so
    * EnsureRequirements co-partitions the sides (each shuffles ONCE,
    * independently), then every partition pair zips through a single
    * forward pass: consume right rows while their (key, ts) sort key
    * is <= the current left row's, keeping only the latest one; a
    * left row matches iff that buffered row's key equals its own.
    * Per-partition state is one copied key + one copied payload row —
    * constant memory at any scale, and monotone iterators mean each
    * side is read exactly once.
    */
  case class AsOfJoinExec(
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute,
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

    // left rows pass through in their sorted order
    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTs).map(asc)

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
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
      val sortTypes = (lKeyAttrs :+ lTsA).map(_.dataType)
      val nKeys = lKeyAttrs.length

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lSortProj = UnsafeProjection.create(lKeyAttrs :+ lTsA, lOut)
        val rSortProj = UnsafeProjection.create(rKeyAttrs :+ rTsA, rOut)
        val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
        val payloadProj = UnsafeProjection.create(rTsA +: payloadA, rOut)
        val outProj =
          UnsafeProjection.create(outAttrs, lOut ++ rightOutA)
        val ord = RowOrdering.createNaturalAscendingOrdering(sortTypes)
        val nullPayload = new GenericInternalRow(payloadA.length + 1)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var bufKey: InternalRow = _
          private var bufPayload: InternalRow = _
          private var rNext: InternalRow =
            if (rIter.hasNext) rIter.next() else null

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val lSort = lSortProj(lRow)
            val lTsNull = lSort.isNullAt(nKeys)
            var advance = true
            while (advance && rNext != null) {
              val rSort = rSortProj(rNext)
              if (!lTsNull && ord.compare(rSort, lSort) <= 0) {
                // a NULL right ts can never satisfy ts_r <= ts_l
                if (!rSort.isNullAt(nKeys)) {
                  bufKey = rKeyProj(rNext).copy()
                  bufPayload = payloadProj(rNext).copy()
                }
                rNext = if (rIter.hasNext) rIter.next() else null
              } else advance = false
            }
            val lKey = lKeyProj(lRow)
            val matched = bufKey != null && !lKey.anyNull &&
              lKey == bufKey
            joined(lRow, if (matched) bufPayload else nullPayload)
            outProj(joined)
          }
        }
      }
    }
  }

  /** Register the strategy on `spark` (idempotent) — extraStrategies
    * is the runtime-injection path that needs no session rebuild;
    * [[graft.functions.GraftExtensions]] also injects it for
    * config-driven sessions.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    // extraStrategies is a plain var: the contains/append pair must be
    // atomic or concurrent join() calls can lose a registration or
    // stack duplicates
    exp.synchronized {
      if (!exp.extraStrategies.contains(AsOfJoinStrategy))
        exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** As-of join `left` to `right` on `keys` with
    * `right.rightTs <= left.leftTs`; attaches `asof_<rightTs>` and
    * `asof_<c>` for each payload column (null when unmatched) — the
    * same surface as [[graft.ops.AsOf.join]], planned natively.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val s = NativeJoinSides.resolve(left, right, keys, leftTs, rightTs,
      rightCols, "asof_", "as-of")
    GraftBridge.ofRows(spark, AsOfJoinNode(
      s.lPlan, s.rPlan, s.lKeys, s.rKeys, s.lTs, s.rTs, s.payload,
      s.rightOut))
  }
}
