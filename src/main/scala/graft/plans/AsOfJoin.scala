package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.{DataFrame, GraftInternal, SparkSession}

/** Native AS-OF JOIN — the whole-operator custom tier of the contract
  * (LogicalPlan + Strategy + SparkPlan, registered via extraStrategies /
  * SparkSessionExtensions).
  *
  * Semantics: left-outer as-of — for every left row, the single right row
  * with the same key and the greatest right time <= left time (ties on
  * time broken by the largest `rightTieBreak`), or nulls when no prior
  * right row exists. An optional `tolerance` (same units as the time
  * expressions) bounds the lookback: a latest-prior row older than
  * `leftTime - tolerance` null-extends instead of matching — pandas
  * merge_asof's tolerance semantics.
  *
  * Why a custom operator (SURVEY §5.3 bar): the compositional form
  * (inequality join + row_number + filter rn=1) materializes EVERY
  * (left, prior-right) pair before discarding all but one — O(n × priors)
  * rows through the window. This operator is the classic sorted-merge:
  * both sides hash-partitioned on key and sorted by (key, time), each
  * partition consumed ONCE with a one-row lookback — O(n + m), no
  * intermediate blowup, no window state. At 100 TB the compositional form
  * is quadratic-ish in events-per-entity; this is linear.
  *
  * Correctness gate: the `join_asof_native` key runs this operator against
  * the same DuckDB oracle as the compositional `join_asof`.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Option[Long] = None) extends BinaryNode {
  // left-outer: right side nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Option[Long] = None) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTieBreak, org.apache.spark.sql.catalyst.expressions.Ascending)))

  /** Primitive accessor for a bound integral expression: the common case
    * (a plain column reference of long/int/timestamp/date type) reads the
    * unsafe row directly — no per-row boxing in the merge loop; anything
    * else falls back to interpreted eval. Returns (isNull, getLong). */
  private def longAccessor(e: Expression)
      : (InternalRow => Boolean, InternalRow => Long) = e match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
      import org.apache.spark.sql.types._
      b.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          (r => r.isNullAt(b.ordinal), r => r.getLong(b.ordinal))
        case IntegerType | DateType =>
          (r => r.isNullAt(b.ordinal), r => r.getInt(b.ordinal).toLong)
        case ShortType =>
          (r => r.isNullAt(b.ordinal), r => r.getShort(b.ordinal).toLong)
        case _ =>
          (r => e.eval(r) == null, r => e.eval(r).asInstanceOf[Number].longValue())
      }
    case _ =>
      (r => e.eval(r) == null, r => e.eval(r).asInstanceOf[Number].longValue())
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val (lKeyNull, lKeyGet) = longAccessor(lKeyB)
    val (lTimeNull, lTimeGet) = longAccessor(lTimeB)
    val (rKeyNull, rKeyGet) = longAccessor(rKeyB)
    val (rTimeNull, rTimeGet) = longAccessor(rTimeB)
    val nRight = right.output.size
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      // streaming merge with one-row lookback; right rows must be copied
      // (unsafe row buffers are reused by the upstream iterator)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var candidate: InternalRow = null
      var candidateKey: Long = 0L

      def rKeyOf(r: InternalRow): Long = rKeyGet(r)
      def rTimeOf(r: InternalRow): Long = rTimeGet(r)
      // SQL comparison semantics: a null key/time can never satisfy the
      // as-of predicate — null right rows are skipped, null left rows
      // null-extend without consuming the cursor.
      def rNull(r: InternalRow): Boolean = rKeyNull(r) || rTimeNull(r)
      def nextRight(): InternalRow = {
        var n: InternalRow = null
        while (n == null && rIter.hasNext) {
          val c = rIter.next()
          if (!rNull(c)) n = c.copy()
        }
        n
      }
      if (rHead != null && rNull(rHead)) rHead = nextRight()

      lIter.map { lRow =>
        if (lKeyNull(lRow) || lTimeNull(lRow)) {
          project(joined(lRow, nullRight))
        } else {
        val lk = lKeyGet(lRow)
        val lt = lTimeGet(lRow)
        // advance the right cursor through all rows usable for (lk, lt)
        while (rHead != null &&
          (rKeyOf(rHead) < lk || (rKeyOf(rHead) == lk && rTimeOf(rHead) <= lt))) {
          if (rKeyOf(rHead) == lk) { candidate = rHead; candidateKey = lk }
          rHead = nextRight()
        }
        val matched = candidate != null && candidateKey == lk &&
          rTimeOf(candidate) <= lt &&
          tolerance.forall(t => lt - rTimeOf(candidate) <= t)
        project(joined(lRow, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ---- whole-stage codegen of the merge loop (SURVEY §8.4 candidate 3).
  // The SortMergeJoin pattern: this node is the produce root of its stage —
  // both sorted children arrive as plain row iterators (inputs[0]/[1]) and
  // the generated Java drives the same one-pass lookback as doExecute,
  // with key/time reads compiled to direct primitive row accessors and the
  // output row built inline by the parent's consume. The interpreted
  // doExecute path stays as the fallback for non-integral/non-column
  // key/time expressions.

  /** (ordinal, primitive getter) when the bound expression is a plain
    * integral column — the codegen fast path; None falls back. */
  private def integralBound(e: Expression, attrs: Seq[Attribute]): Option[(Int, String)] =
    BindReferences.bindReference(e, attrs) match {
      case b: BoundReference =>
        import org.apache.spark.sql.types._
        b.dataType match {
          case LongType | TimestampType | TimestampNTZType => Some((b.ordinal, "getLong"))
          case IntegerType | DateType => Some((b.ordinal, "getInt"))
          case ShortType => Some((b.ordinal, "getShort"))
          case _ => None
        }
      case _ => None
    }

  override def supportCodegen: Boolean =
    integralBound(leftKey, left.output).isDefined &&
      integralBound(leftTime, left.output).isDefined &&
      integralBound(rightKey, right.output).isDefined &&
      integralBound(rightTime, right.output).isDefined

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // the matched right row is a buffer that later left rows may replace
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val rHead = ctx.addMutableState("InternalRow", "asofRHead")
    val cand = ctx.addMutableState("InternalRow", "asofCandidate")
    val candKey = ctx.addMutableState("long", "asofCandKey")
    val rInit = ctx.addMutableState("boolean", "asofRInit")

    val (lkOrd, lkGet) = integralBound(leftKey, left.output).get
    val (ltOrd, ltGet) = integralBound(leftTime, left.output).get
    val (rkOrd, rkGet) = integralBound(rightKey, right.output).get
    val (rtOrd, rtGet) = integralBound(rightTime, right.output).get

    // skip right rows with null key/time (they can never satisfy the
    // as-of predicate); copy survivors out of the reused sort buffer
    val nextRight = ctx.addNewFunction("asofNextValidRight",
      s"""
         |private InternalRow asofNextValidRight() {
         |  while ($rightInput.hasNext()) {
         |    InternalRow r = (InternalRow) $rightInput.next();
         |    if (!(r.isNullAt($rkOrd) || r.isNullAt($rtOrd))) return r.copy();
         |  }
         |  return null;
         |}
       """.stripMargin)

    val leftRow = ctx.freshName("asofLeftRow")
    val matched = ctx.freshName("asofMatched")
    val lNull = ctx.freshName("asofLNull")
    val lk = ctx.freshName("asofLk")
    val lt = ctx.freshName("asofLt")
    val rk = ctx.freshName("asofRk")
    val ct = ctx.freshName("asofCt")

    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val javaType = CodeGenerator.javaType(a.dataType)
      val getVal = CodeGenerator.getValue(matched, a.dataType, i.toString)
      val c = code"""
        |boolean $isNull = ($matched == null) || $matched.isNullAt($i);
        |$javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getVal);
      """.stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    val tolCheck = tolerance.map(t => s" && $lt - $ct <= ${t}L").getOrElse("")

    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  if (!$rInit) { $rHead = $nextRight(); $rInit = true; }
       |  boolean $lNull = $leftRow.isNullAt($lkOrd) || $leftRow.isNullAt($ltOrd);
       |  InternalRow $matched = null;
       |  if (!$lNull) {
       |    long $lk = (long) $leftRow.$lkGet($lkOrd);
       |    long $lt = (long) $leftRow.$ltGet($ltOrd);
       |    while ($rHead != null) {
       |      long $rk = (long) $rHead.$rkGet($rkOrd);
       |      if ($rk < $lk || ($rk == $lk && ((long) $rHead.$rtGet($rtOrd)) <= $lt)) {
       |        if ($rk == $lk) { $cand = $rHead; $candKey = $lk; }
       |        $rHead = $nextRight();
       |      } else break;
       |    }
       |    if ($cand != null && $candKey == $lk) {
       |      long $ct = (long) $cand.$rtGet($rtOrd);
       |      if ($ct <= $lt$tolCheck) $matched = $cand;
       |    }
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

/** Optimizer rule for the custom node: Catalyst cannot push predicates
  * through a LogicalPlan it does not know, so a Filter sitting on an
  * AsOfJoinPlan would otherwise run after the join. Conjuncts that
  * reference only left-side output move below the join (sound for
  * left-outer as-of: dropping a left row before or after joining is
  * equivalent, and right rows are untouched). Right-side conjuncts must
  * NOT be pushed — they would turn filtered-out matches into nulls. */
object AsOfPushDown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(a.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(leftOnly.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, tol) :: Nil
    case _ => Nil
  }
}

object AsOf {

  /** Register the strategy (idempotent) and build the as-of joined frame.
    * Key/time columns are resolved by name against each side; key and time
    * must be integral/timestamp-backed (evaluated as long). */
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      tolerance: Option[Long] = None): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfPushDown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfPushDown
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    GraftInternal.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      attr(rPlan, rightTieBreak), tolerance))
  }
}
