package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(array<double>, array<double>) -> double`: sequential
  * left-fold dot product as a native Catalyst expression with
  * whole-stage codegen — the tight loop the interpreted
  * `zip_with`+`aggregate` formulation can't give (those evaluate a
  * lambda object per element). Accumulation order is index order,
  * identical to the HOF formulation and to DuckDB's list_dot_product,
  * so oracle results are bit-equal.
  *
  * This is the SURVEY §4.2 "custom Expression only if the built-in
  * formulation is a bench bottleneck" escape hatch — measured ~3x on
  * the kNN path. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // (ExpectsInputTypes is not usable outside spark.sql — its
  // AbstractDataType is private[sql] — so check manually.)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // NULL semantics mirror the HOF form EXACTLY, so the optimizer
  // rewrite below is result-preserving on every input: zip_with pads a
  // length mismatch with nulls and the fold then goes null, and a null
  // element nulls its product and the fold — so mismatch -> NULL and
  // any null slot -> NULL here too (the result can be null even for
  // non-null inputs, hence the nullable override).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0,
  * (acc,v) -> acc+v)` — into the codegen `DotProduct` expression.
  * Users write the composable HOF form; the optimizer swaps in the
  * tight loop. Accumulation order is identical (index-order left
  * fold), so the rewrite is result-preserving bit-for-bit. */
object DotProductRewrite extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, org.apache.spark.sql.types.DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
          ((isVar(mul.left, x) && isVar(mul.right, y)) || (isVar(mul.left, y) && isVar(mul.right, x))) &&
          ((isVar(add.left, acc) && isVar(add.right, v)) || (isVar(add.left, v) && isVar(add.right, acc))) &&
          isVar(fin, fv) =>
      DotProduct(a, b)
  }
}

/** Session-extensions hook (`spark.sql.extensions=graft.functions.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`): injects the function
  * registry entry and the HOF->native optimizer rewrite at session
  * build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotProductDescriptor)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // whole-operator extension (tier (c)): the native as-of join
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // runtime source-key file pruning for merge-on-read SQL DML —
    // preCBO so the V2 scans already exist when the rule fires
    ext.injectPreCBORule(_ => graft.plans.MergeRuntimeFilePruning)
  }
}

object GraftFunctions {
  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"graft_dot expects exactly 2 arguments, got ${children.length}")
      DotProduct(children(0), children(1))
    })

  /** Idempotent runtime registration — lets library code use the
    * function on sessions built without the extensions hook. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_dot"))) {
      reg.registerFunction(
        dotProductDescriptor._1, dotProductDescriptor._2, dotProductDescriptor._3)
    }
  }

  /** Column-API face of the native dot product. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot", a, b)
  }
}
