package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * `zip_with` + `aggregate` express a dot product declaratively, but
  * higher-order functions evaluate through per-element lambda dispatch and
  * fall out of whole-stage codegen — measurable at millions of candidate
  * pairs (ANN re-rank). This is the case SURVEY §7 reserves for a custom
  * `Expression`: semantics the built-ins can express but not at the needed
  * efficiency. `DotProduct` generates a tight primitive loop inside
  * whole-stage codegen; accumulation order is ascending-index, identical to
  * the `aggregate` fold it replaces (keeps cross-engine float parity).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Packed sign-bit signature of a vector against a FIXED hyperplane
  * matrix: bit p = (dot(vec, planes(p)) > 0), little-endian. Spelled as
  * `bits` separate [[DotProduct]]s + shiftleft/OR this is `bits`
  * expression-tree evaluations per row; fused, it is one tight
  * two-level loop over a referenced double[][] inside whole-stage
  * codegen — the hot path of every LSH/binary-quantization operator.
  * Arithmetic parity contract: per plane the accumulation is the SAME
  * ascending-index fold as [[DotProduct]] and the bit test is the same
  * `> 0`, so signatures are bit-identical to the unfused form (and to
  * the SQL oracles that replay it via list_dot_product).
  */
case class SignBits(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64,
    "SignBits packs at most 64 planes into a long")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sign_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(x.numElements(), pl.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * pl(i); i += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pls = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $pls.length; $p++) {
         |  double[] $pl = $pls[$p];
         |  int $n = Math.min($x.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $pl[$i];
         |  }
         |  if ($s > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignBits = copy(child = newChild)
}

object VectorExpressions {
  /** Column-level dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Packed sign-bit signature against a fixed plane matrix. */
  def signBits(vec: Column, planes: Array[Array[Double]]): Column =
    bridge.column(SignBits(bridge.expression(vec), planes))
}
