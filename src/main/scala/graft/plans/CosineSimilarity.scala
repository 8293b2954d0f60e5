package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst cosine-similarity over two float/double array columns.
  *
  * Why a custom expression instead of `zip_with` + `aggregate`: Spark's
  * higher-order functions are interpreted (CodegenFallback + per-element
  * lambda dispatch + an allocated intermediate array), which is the hot
  * path of O(candidates) similarity verification. This expression emits a
  * single fused whole-stage-codegen loop, ~10-50× less work per pair.
  *
  * Numerics are kept bit-identical to the declarative form used by the
  * DuckDB oracles (`SURVEY.md §4`): one sequential left-to-right
  * accumulation of dot/aa/bb widened to double, then
  * `dot / sqrt(aa * bb)` — so swapping this in does not move any rounded
  * output.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  /** Mismatched lengths → null (malformed embeddings must surface, not
    * produce a plausible truncated score; matches the declarative
    * `zip_with` form, whose null padding also nulls the fold). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    dot / math.sqrt(aa * bb)
  }

  // All generated locals are ctx.freshName'd: several CosineSimilarity
  // instances can land in ONE generated function (e.g. the 8-band LSH
  // bucket projection), and bare names collide into a janino
  // "Redefinition of local variable" compile error — which Spark then
  // silently papers over with interpreted eval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val lGet =
        if (elemType(left) == FloatType) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      val rGet =
        if (elemType(right) == FloatType) s"(double) $y.getFloat($i)"
        else s"$y.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $aa = 0.0, $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $lGet;
         |    double $yv = $rGet;
         |    $dot += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / java.lang.Math.sqrt($aa * $bb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration so queries can use `call_function`. */
object GraftFunctions {
  val CosineName = "graft_cosine"
  val JobHistoryAttrsName = "graft_jobhistory_attrs"

  /** Idempotent imperative registration (also usable from
    * SparkSessionExtensions via [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(CosineName)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[CosineSimilarity].getName, CosineName),
        (children: Seq[Expression]) =>
          CosineSimilarity(children(0), children(1)))
    }
    val jhIdent = FunctionIdentifier(JobHistoryAttrsName)
    if (!registry.functionExists(jhIdent)) {
      registry.registerFunction(
        jhIdent,
        new ExpressionInfo(classOf[JobHistoryAttrs].getName,
          JobHistoryAttrsName),
        (children: Seq[Expression]) => JobHistoryAttrs(children.head))
    }
  }
}

/** `spark.sql.extensions`-pluggable registration of every graft native
  * expression (cosine + minhash/simhash signatures). */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        GraftFunctions.CosineName),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier(SignatureFunctions.MinHashName),
      new ExpressionInfo(classOf[MinHashSig].getName,
        SignatureFunctions.MinHashName),
      (children: Seq[Expression]) => MinHashSig(children.head, 128)))
    ext.injectFunction((
      FunctionIdentifier(SignatureFunctions.SimHashName),
      new ExpressionInfo(classOf[SimHashSig].getName,
        SignatureFunctions.SimHashName),
      (children: Seq[Expression]) => SimHashSig(children.head)))
    ext.injectFunction((
      FunctionIdentifier(SignatureFunctions.MinHashUnionName),
      new ExpressionInfo(classOf[MinHashUnion].getName,
        SignatureFunctions.MinHashUnionName),
      (children: Seq[Expression]) => MinHashUnion(children.head, 128)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.JobHistoryAttrsName),
      new ExpressionInfo(classOf[JobHistoryAttrs].getName,
        GraftFunctions.JobHistoryAttrsName),
      (children: Seq[Expression]) => JobHistoryAttrs(children.head)))
  }
}
