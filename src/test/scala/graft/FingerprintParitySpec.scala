package graft

import org.apache.spark.sql.functions._

/** Regression pins for the portable fingerprint's Unicode semantics
  * (VERDICT r10 "what's wrong" #1, restored per ADVICE r11: the
  * round-11 spec rewrite dropped these without relocating them).
  * Every DuckDB oracle folds per-character `unicode(c)` CODEPOINTS,
  * while DocFingerprint originally folded UTF-8 BYTES — identical on
  * the all-ASCII gate corpus, divergent on the first multilingual
  * document. These tests pin the codepoint parity on text the gate
  * corpus cannot supply (2-, 3- and 4-byte UTF-8 sequences) and the
  * codegen≡interpreted agreement off-ASCII.
  */
class FingerprintParitySpec extends SparkSpec {
  import spark.implicits._

  test("doc_fingerprint folds CODEPOINTS: non-ASCII parity with unicode(c)") {
    graft.functions.DocFingerprint.register(spark)
    // 2-byte (Latin-1 supplement), 3-byte (CJK), 4-byte (astral /
    // surrogate pair in UTF-16) sequences plus mixed text — each
    // class exercises a distinct branch of the inline UTF-8 decode
    val texts = Seq(
      "héllo wörld",                 // 2-byte seqs
      "你好，世界",                   // 3-byte seqs
      "math: 𝒜 plus 😀",  // 4-byte seqs (astral)
      "mixed: aé中😊z9",
      "",                            // empty stays 0
      "plain ascii 42")
    val got = texts.toDF("text")
      .select(graft.functions.DocFingerprint.of(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    // the oracle semantic, computed independently: fold h*31 + cp
    // over Unicode codepoints exactly as DuckDB's
    // list_transform(string_split(text,''), c -> unicode(c)) does
    val want = texts.map { t =>
      var h = 0L
      t.codePoints().toArray.foreach { cp =>
        h = (h * 31L + cp) % graft.functions.DocFingerprint.Modulus
      }
      h
    }
    assert(got.toSeq == want)
    assert(want(0) != want(5), "non-ASCII text must not hash like ASCII")
    // and the byte fold it replaced must NOT match on non-ASCII —
    // proving the test would have caught the original trap
    val byteFold = {
      var h = 0L
      for (b <- texts.head.getBytes("UTF-8"))
        h = (h * 31L + (b & 0xff)) % graft.functions.DocFingerprint.Modulus
      h
    }
    assert(byteFold != want.head,
      "a byte fold must diverge from the codepoint fold on non-ASCII")
  }

  test("doc_fingerprint: codegen and interpreted paths agree off-ASCII") {
    graft.functions.DocFingerprint.register(spark)
    val texts = Seq("é", "中文 docs", "😀😀", "añño")
    val df = texts.toDF("text")
    val gen = df.select(graft.functions.DocFingerprint.of(col("text")))
      .collect().map(_.getLong(0)).toSeq
    // filter through a non-codegen barrier is unreliable; instead hit
    // the interpreted path directly via the expression's eval
    val interp = texts.map { t =>
      graft.functions.DocFingerprint(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Long]
    }
    val ref = texts.map(graft.functions.DocFingerprint.reference)
    assert(gen == ref)
    assert(interp == ref)
  }
}
