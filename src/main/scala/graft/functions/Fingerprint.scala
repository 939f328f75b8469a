package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint as a native Catalyst
  * expression with whole-stage codegen (preference (b) in the
  * custom-operator ladder — a scalar function Spark lacks, cheap
  * enough that a UDF's ser/de overhead would dominate it).
  *
  * h = fold(bytes)(h * 31 + byte) mod (2^31 - 1), over the UTF-8
  * bytes, so the value is stable across JVMs, charsets and engines.
  * Used for cheap content-identity (exact-dup buckets, change
  * detection) where a 64-bit cryptographic hash is overkill.
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % DocFingerprint.Modulus
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${DocFingerprint.Modulus}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DocFingerprint {
  /** Mersenne prime 2^31-1: keeps h*31+255 < 2^36, far from long
    * overflow, unlike a 2^61-1 modulus.
    */
  val Modulus: Long = 2147483647L

  /** Register in the session's function registry; afterwards usable
    * from both SQL and the Column API via [[of]]. (Spark 4's Column
    * no longer exposes a public Expression constructor, so the
    * registry is the supported bridge.)
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "doc_fingerprint", exprs => DocFingerprint(exprs.head), "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def of(c: Column): Column =
    org.apache.spark.sql.functions.call_function("doc_fingerprint", c)

  /** Pure-Scala reference implementation for tests. */
  def reference(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes("UTF-8")) h = (h * 31L + (b & 0xff)) % Modulus
    h
  }
}
