package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** L1 distance of two int-array histograms as a native Catalyst
  * expression with whole-stage codegen — the complete edit-distance
  * lower bound `L1(hist(a), hist(b)) <= 2 * ed(a, b)` that prunes
  * candidate pairs before the banded DP (EditJoin tier 2).
  *
  * Why not compose it: the HOF form (zip_with + aggregate) is
  * CodegenFallback — an interpreted tree walk per element per
  * CANDIDATE row — and the literal-unrolled 37-term `element_at`
  * alternative measurably knocked the whole join stage out of
  * whole-stage codegen (37 ANSI-checked element_at + abs + add terms
  * inside the join condition; qd67 went 6.1 s -> 20.6 s at sf0.1).
  * This 8-line loop keeps the stage fused and costs ~ns per bin.
  *
  * Null semantics match [[VecDot]]: mismatched lengths or a null
  * element yield NULL (a pruning predicate on NULL is simply false,
  * which is the conservative outcome for malformed inputs).
  */
case class HistL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hist_l1"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hist_l1 needs array<int> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getInt(i) - y.getInt(i)
      acc += (if (d < 0) -d else d)
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $d = $a.getInt($i) - $b.getInt($i);
         |    $acc += ($d < 0) ? -$d : $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HistL1 {
  /** Per-session temp registration (same bridge as [[VecDot]]);
    * clusters get it from `graft.GraftExtensions` instead. Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hist_l1", exprs => HistL1(exprs(0), exprs(1)), "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def of(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("hist_l1", a, b)

  /** Pure-Scala reference implementation for tests. */
  def reference(a: Seq[Int], b: Seq[Int]): Int = {
    require(a.length == b.length)
    a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
  }
}
