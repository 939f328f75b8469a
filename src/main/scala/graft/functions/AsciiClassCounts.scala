package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass ASCII character-class counter as a native Catalyst
  * expression with whole-stage codegen: returns a struct of
  * (alpha, digit, space) counts over one byte scan.
  *
  * The regex formulation (`length(regexp_replace(text, '[^A-Za-z]',
  * ''))` etc.) costs one full scan PLUS a same-sized string
  * allocation per class; quality scoring needs three classes, so a
  * 10 MB corpus paid ~6 passes and 30 MB of garbage per projection.
  * One branchy byte loop does all three classes allocation-free —
  * the same extension-ladder rung as [[DocFingerprint]] (scalar the
  * engine lacks; a UDF's ser/de would dominate the work).
  *
  * Byte-scan correctness on multibyte text: UTF-8 continuation and
  * lead bytes are all >= 0x80, so they can never equal an ASCII
  * letter/digit/space byte — counts over bytes equal counts over
  * codepoints for these classes in any well-formed UTF-8 string.
  * Space means 0x20 only (mirrors the oracle's literal-space regex,
  * not \s).
  */
case class AsciiClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AsciiClassCounts.Schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var a = 0; var d = 0; var sp = 0; var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) a += 1
      else if (b >= '0' && b <= '9') d += 1
      else if (b == ' ') sp += 1
      i += 1
    }
    InternalRow(a, d, sp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val a = ctx.freshName("alpha")
      val d = ctx.freshName("digit")
      val sp = ctx.freshName("space")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $a = 0; int $d = 0; int $sp = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z')) $a++;
         |  else if ($b >= '0' && $b <= '9') $d++;
         |  else if ($b == ' ') $sp++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$a, $d, $sp});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiClassCounts {
  val Schema: StructType = StructType(Seq(
    StructField("alpha", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("space", IntegerType, nullable = false)))

  /** Register in the session's function registry (same bridge as
    * [[DocFingerprint]]: Spark 4's Column API has no public
    * Expression constructor).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registration.registerOnce(spark, "ascii_class_counts",
      exprs => AsciiClassCounts(exprs.head))

  /** Column wrapper; requires [[register]] on the active session. */
  def of(c: Column): Column =
    org.apache.spark.sql.functions.call_function("ascii_class_counts", c)

  /** Pure-Scala reference implementation for tests. */
  def reference(s: String): (Int, Int, Int) = {
    var a = 0; var d = 0; var sp = 0
    s.foreach {
      case ch if (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z') => a += 1
      case ch if ch >= '0' && ch <= '9' => d += 1
      case ' ' => sp += 1
      case _ => ()
    }
    (a, d, sp)
  }
}
