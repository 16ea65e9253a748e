package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for the vector hot path (SURVEY §5.3): a
  * whole-stage-codegen dot product over two float arrays.
  *
  * Preference order applied (builder contract): built-in higher-order
  * functions already express dot products, but their per-element lambda is
  * interpreted; for the ANN/similarity paths that fold 64 elements per row
  * pair this is the measured bottleneck, which justifies dropping to a
  * custom `Expression` with `doGenCode` — a tight primitive `for` loop in
  * generated Java, no boxing, no closure dispatch. A Scala UDF would box
  * every array; this stays inside WholeStageCodegen.
  *
  * Deterministic: strict left-to-right accumulation in array order, same in
  * interpreted and codegen paths.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Scaled-long dot product: per element accumulate
  * `FLOOR(a[i]*b[i]*1e14 + 0.5)` as a 64-bit integer — the exact twin of
  * the oracle's `SUM(CAST(FLOOR(a.x * b.x * 1e14 + 0.5) AS BIGINT))` over
  * an unnested layout (Det rule 3: each element canonicalizes via pure IEEE
  * ops, the integer sum is exact and order-free, so the posexplode + shuffle
  * + hash-agg a long-sum plan needs collapses into one per-row codegen'd
  * loop). VERDICT r01 item 6. */
case class FloatVecScaledDotL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sdotl expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e14 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(
         |    (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1e14 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Scaled-long squared distance over two double arrays: per element
  * accumulate `FLOOR((a[i]-b[i])² * 1e14 + 0.5)` as a 64-bit integer — the
  * exact twin of the oracle's unnested
  * `SUM(CAST(FLOOR((u.x - c.c) * (u.x - c.c) * 1e14 + 0.5) AS BIGINT))`
  * (Det rule 3: pure IEEE per-element ops, exact order-free integer sum),
  * collapsing the posexplode + pos-join + dim×-row hash-agg the distance
  * computation otherwise needs into one per-pair codegen'd loop. */
case class DoubleVecScaledL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sl2 expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += math.floor(d * d * 1e14 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += (long) java.lang.Math.floor($d * $d * 1e14 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[DoubleVecScaledL2]] at the 1e10 grid — the LOF family's distance
  * quantization (dq_outlier_lof/`_ann` floor per-element squared diffs
  * at 1e10 before the exact long sum, Quality.scala). Same exact-twin
  * argument as the 1e14 form; a separate expression rather than a scale
  * argument keeps both whole-stage codegen'd with literal constants.
  * Round 13: replaces the interpreted zip_with+aggregate higher-order
  * fold on the LOF pair stages (HOFs are CodegenFallback — measured
  * ~1.5 s of the exact key's steady time). */
case class DoubleVecScaledL2E10(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sl2e10 expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += math.floor(d * d * 1e10 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += (long) java.lang.Math.floor($d * $d * 1e10 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED, duplicate-free int-id arrays — the
  * set-similarity verify kernel (llm_ngram_jaccard runs it on ~2.2M
  * candidate pairs per bench). `array_intersect` builds a hash set per
  * invocation (one allocation + rehash per ROW); this is the classic
  * two-pointer merge: zero allocation, branch-predictable, whole-stage
  * codegen'd. Callers own the contract that both arrays are ascending and
  * distinct (array_sort over dictionary ids in the shipped plans);
  * DetLemmaSpec proves equivalence to array_intersect generatively. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_icount expects (array<int>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { acc += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  int $x = $a.getInt($i); int $y = $b.getInt($j);
         |  if ($x == $y) { $acc++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance sum over packed arrays — the batched ADC scan
  * kernel (llm_ann_batch_pq). `lut` is one query's M·K distance table
  * flattened row-major (index m*K + ck, K inferred as lut.len / code.len);
  * `code` is one vector's M centroid ids. Returns Σ_m lut[m*K + code[m]]
  * — exactly the former join-on-(m, ck) + SUM(d2) aggregate, but computed
  * per (query, vector) PAIR: the M-row expansion never materializes, so
  * the Q·N pair scan feeds M× fewer rows into the plan (guide §2.3).
  * Long addition is order-free, so the sum is bit-identical to the
  * aggregate it replaces (AnnPropertySpec pins the equality). */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pqadc expects (array<bigint>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val code = r.asInstanceOf[ArrayData]
    val m = code.numElements()
    val k = if (m == 0) 0 else lut.numElements() / m
    var i = 0; var acc = 0L
    while (i < m) {
      acc += lut.getLong(i * k + code.getInt(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val m = ctx.freshName("m"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |int $m = $r.numElements();
         |int $k = ($m == 0) ? 0 : $l.numElements() / $m;
         |long $acc = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $l.getLong($i * $k + $r.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  val DotName = "graft_dot"
  val SDotLName = "graft_sdotl"
  val SL2Name = "graft_sl2"
  val SL2E10Name = "graft_sl2e10"
  val ICountName = "graft_icount"
  val PqAdcName = "graft_pqadc"

  private val dotBuilder: Seq[Expression] => Expression =
    children => FloatVecDot(children(0), children(1))

  private val sdotlBuilder: Seq[Expression] => Expression =
    children => FloatVecScaledDotL(children(0), children(1))

  private val sl2Builder: Seq[Expression] => Expression =
    children => DoubleVecScaledL2(children(0), children(1))

  private val sl2e10Builder: Seq[Expression] => Expression =
    children => DoubleVecScaledL2E10(children(0), children(1))

  private val icountBuilder: Seq[Expression] => Expression =
    children => SortedIntersectCount(children(0), children(1))

  private val pqadcBuilder: Seq[Expression] => Expression =
    children => PqAdcSum(children(0), children(1))

  /** Imperative registration — used by query builders so the expression is
    * available regardless of how the session was constructed. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(DotName, dotBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(SDotLName, sdotlBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(SL2Name, sl2Builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(SL2E10Name, sl2e10Builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(ICountName, icountBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(PqAdcName, pqadcBuilder, "built-in")
  }

  /** Column-level helper: `dot(a, b)` after [[register]]. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(DotName, a, b)

  /** Column-level helper: `sdotl(a, b)` after [[register]]. */
  def sdotl(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(SDotLName, a, b)

  /** Column-level helper: `sl2(a, b)` after [[register]]. */
  def sl2(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(SL2Name, a, b)

  /** Column-level helper: `sl2e10(a, b)` after [[register]]. */
  def sl2e10(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(SL2E10Name, a, b)

  /** Column-level helper: `icount(a, b)` after [[register]] — both arrays
    * must be sorted ascending and duplicate-free. */
  def icount(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(ICountName, a, b)

  /** Column-level helper: `pqadc(lut, code)` after [[register]] — `lut`
    * flattened row-major over (m, ck), `code` the M centroid ids. */
  def pqadc(lut: Column, code: Column): Column =
    org.apache.spark.sql.functions.call_function(PqAdcName, lut, code)
}

/** Config-level registration: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions` gives a session
  * the full custom tier — the vector expressions as built-ins AND the
  * as-of join's planner strategy + pushdown rule (the
  * SparkSessionExtensions surface of the contract; `AsOf.join` also
  * registers imperatively for sessions built without the conf). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfPushDown)
    e.injectFunction((
      FunctionIdentifier(VectorExprs.DotName),
      new ExpressionInfo(classOf[FloatVecDot].getName, VectorExprs.DotName),
      children => FloatVecDot(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(VectorExprs.SDotLName),
      new ExpressionInfo(classOf[FloatVecScaledDotL].getName, VectorExprs.SDotLName),
      children => FloatVecScaledDotL(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(VectorExprs.SL2Name),
      new ExpressionInfo(classOf[DoubleVecScaledL2].getName, VectorExprs.SL2Name),
      children => DoubleVecScaledL2(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(VectorExprs.SL2E10Name),
      new ExpressionInfo(classOf[DoubleVecScaledL2E10].getName, VectorExprs.SL2E10Name),
      children => DoubleVecScaledL2E10(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(VectorExprs.ICountName),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, VectorExprs.ICountName),
      children => SortedIntersectCount(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(VectorExprs.PqAdcName),
      new ExpressionInfo(classOf[PqAdcSum].getName, VectorExprs.PqAdcName),
      children => PqAdcSum(children(0), children(1))))
    // the native tile-stencil family (graft.raster.TileExprs) — same
    // contract as the vector tier: conf-built sessions get the SQL names
    // without routing through RasterGrid's self-registering methods
    e.injectFunction((
      FunctionIdentifier(graft.raster.TileExprs.Up2xName),
      new ExpressionInfo(classOf[graft.raster.TileUpsample2x].getName,
        graft.raster.TileExprs.Up2xName),
      children => graft.raster.TileUpsample2x(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier(graft.raster.TileExprs.Focal3Name),
      new ExpressionInfo(classOf[graft.raster.TileFocalSum3x3].getName,
        graft.raster.TileExprs.Focal3Name),
      children => graft.raster.TileFocalSum3x3(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier(graft.raster.TileExprs.DownName),
      new ExpressionInfo(classOf[graft.raster.TileDownsample].getName,
        graft.raster.TileExprs.DownName),
      children => graft.raster.TileDownsample(
        children(0), children(1), children(2), children(3))))
  }
}
