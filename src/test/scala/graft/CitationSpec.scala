package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stale-claim backstop (VERDICT r11 #7: round 11 shipped a scaladoc
  * citing a PqSpec measurement that did not exist after a spec
  * rewrite deleted the tests). Every `... in <Name>Spec` verification
  * claim in library scaladoc must point at a spec FILE that exists —
  * a rename or deletion of the cited suite fails here instead of
  * leaving a silent false claim. (Symbol-level verification stays a
  * review habit: `grep -rnE '(measured|pinned|tested) in [A-Z]\w+Spec'
  * src/main` and check each; this spec automates the file half.)
  */
class CitationSpec extends AnyFunSuite {

  test("every spec cited in src/main scaladoc exists under src/test") {
    val srcRoot = new java.io.File("src/main/scala")
    val testRoot = new java.io.File("src/test/scala/graft")
    assume(srcRoot.isDirectory && testRoot.isDirectory,
      "runs from the repo root only")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val cite = "(?:in|of|per) ([A-Z][A-Za-z0-9]+Spec)".r
    val missing = for {
      f <- walk(srcRoot)
      line <- scala.io.Source.fromFile(f, "UTF-8").getLines()
      m <- cite.findAllMatchIn(line)
      spec = m.group(1)
      if !new java.io.File(testRoot, spec + ".scala").exists()
    } yield s"${f.getPath}: cites $spec, no such spec file"
    assert(missing.isEmpty, missing.mkString("\n"))
  }
}
