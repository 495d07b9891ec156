package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, BindReferences, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF join as a first-class operator — the preference-order (c) path:
  * a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered
  * through `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]).
  *
  * Spark has no native as-of join; the composed form
  * ([[graft.ops.Asof.joinLast]]) unions both sides into one window pass —
  * correct, but it carries every LEFT row through the window sort with a
  * null payload and cannot stop scanning the right side early. This
  * operator expresses the real algorithm: co-partition both sides by
  * key, sort each by (key, ts), and stream-merge per partition keeping
  * only the LAST right row seen per key — O(1) state per partition,
  * one pass over each side, no union blow-up. Semantics (inclusive ties,
  * greatest-payload tiebreak, null-key/null-ts rows match nothing) are
  * pinned equal to the composed form by AsofSpec and to DuckDB ASOF by
  * the `q_asof_exec` oracle row.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.payload, p.payloadOut,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // co-partition by key; EnsureRequirements inserts compatible hash
  // exchanges (or reuses existing partitioning — a bucketed layout on the
  // key makes this operator exchange-free, like any equi join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // right side additionally orders by payload so "last consumed wins" is
  // deterministic under (key, ts) ties: the greatest payload — the same
  // tiebreak the composed window form pins with its struct ordering
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val nPayload = payloadOut.size
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
    val payloadB = payload
    val rightOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val payloadProj = UnsafeProjection.create(payloadB, rightOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead on the right + last-match state: O(1) memory
        private var rPeek: InternalRow = if (rIt.hasNext) rIt.next() else null
        private var lastKey: Any = null
        private var lastPayload: InternalRow = null

        private def consume(): Unit = {
          val rk = rKeyB.eval(rPeek)
          val rts = rTsB.eval(rPeek)
          if (rk != null && rts != null) {
            lastKey = InternalRow.copyValue(rk)
            lastPayload = payloadProj(rPeek).copy()
          }
          rPeek = if (rIt.hasNext) rIt.next() else null
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val lrow = lIt.next()
          val lk = lKeyB.eval(lrow)
          val lts = lTsB.eval(lrow)
          if (lk == null || lts == null) return outProj(joined(lrow, nullPayload))
          // drain right rows at or before (lk, lts); rows with a smaller
          // key are consumed too (they can never match a later left row
          // of THIS key, and the key check below ignores them)
          var advancing = true
          while (advancing && rPeek != null) {
            val rk = rKeyB.eval(rPeek)
            val rts = rTsB.eval(rPeek)
            if (rk == null || rts == null) consume()
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0 || (c == 0 && tsOrd.compare(rts, lts) <= 0)) consume()
              else advancing = false
            }
          }
          if (lastKey != null && keyOrd.compare(lastKey, lk) == 0)
            outProj(joined(lrow, lastPayload))
          else outProj(joined(lrow, nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
