package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise minimum of two long arrays (the MinHash signature union
  * operator: min over the union set = element-wise min of the two
  * signatures). Mismatched lengths → null, same convention as
  * [[CosineSimilarity]] — unless `strict`, which throws instead: inside
  * [[MinHashUnion]] the buffer is declared non-nullable, so a null from
  * a wrong-length SQL input would be written into a non-nullable slot
  * and later reads could see garbage; strict mode turns that bad input
  * into a clean error at the first update. Codegen'd fused loop; all
  * locals freshName'd. */
case class ZipMin(left: Expression, right: Expression,
    strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zip_min expects array<bigint>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  // On length mismatch: null when a null is representable and not
  // strict; otherwise (strict validation, or a non-nullable context,
  // e.g. between two agg buffer attributes, where codegen has no isNull
  // variable to assign) throw — inside the aggregate both inputs must be
  // numPerms long, so a mismatch there is bad input or corruption that
  // must surface, not truncate or silently null a non-nullable buffer.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      if (nullable && !strict) return null
      throw new IllegalStateException(
        s"zip_min: length mismatch ($n vs ${y.numElements()})")
    }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.min(x.getLong(i), y.getLong(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val onMismatch =
        if (nullable && !strict) s"${ev.isNull} = true;"
        else
          s"""throw new IllegalStateException(
             |  "zip_min: length mismatch (" + $n + " vs "
             |    + $y.numElements() + ")");""".stripMargin
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  $onMismatch
         |} else {
         |  long[] $out = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = java.lang.Math.min($x.getLong($i), $y.getLong($i));
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZipMin =
    copy(left = newLeft, right = newRight)
}

/** Mergeable MinHash-union aggregate: folds per-row MinHash signatures
  * (`array<bigint>` from [[MinHashSig]]) into the signature of the
  * UNION of the underlying sets, because min(union) = min(mins)
  * element-wise. A `DeclarativeAggregate`, so update and merge are pure
  * Catalyst expressions ([[ZipMin]], codegen'd) that Spark evaluates
  * with map-side partial aggregation — the sketch merges
  * associatively/commutatively across partitions exactly like a
  * built-in agg, which is what makes it a 100 TB primitive: a group's
  * set signature is computed with ONE shuffle of 128-long buffers, no
  * row explosion. Null inputs are skipped (buffer unchanged). */
case class MinHashUnion(child: Expression, numPerms: Int = 128)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_union"

  private lazy val sig = AttributeReference(
    "sig", ArrayType(LongType, containsNull = false), nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sig)

  /** Identity element: all-MaxValue signature (the empty set's sketch). */
  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(Array.fill(numPerms)(Long.MaxValue),
      ArrayType(LongType, containsNull = false)))

  // strict: a wrong-length SQL input (`graft_minhash_union` is SQL-
  // exposed) must fail cleanly at its first update, not write null into
  // the non-nullable buffer and feed garbage to later merge reads
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), sig, ZipMin(sig, child, strict = true)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    ZipMin(sig.left, sig.right))

  override lazy val evaluateExpression: Expression = sig

  override protected def withNewChildInternal(newChild: Expression): MinHashUnion =
    copy(child = newChild)
}
