package graft.ledger

import java.sql.Timestamp

/** The staging-table state machine (SURVEY.md §2.1 S8, §7.4
  * "Idempotency/state"; reference main.py:41-64, 184-219, 417-443):
  * per-file lifecycle rows, status 'A' (active/in-flight) → 'I'
  * (inactive/done). A previous run that died leaves 'A' rows, which
  * the next run must detect before processing.
  *
  * Deliberately NOT a Spark job — this is control-plane metadata, a
  * handful of rows per run (plain JDBC in production, in-memory in
  * tests).
  */
trait RunLedger {
  /** Files from a previous run still marked active (main.py:49-57). */
  def activeFiles(fileNames: Seq[String]): Seq[String]
  /** Mark in-flight (main.py:192-211). */
  def markActive(fileName: String, location: String): Unit
  /** Flip to done (main.py:423-440). */
  def markInactive(fileNames: Seq[String]): Unit
}

/** Test/standalone implementation. */
final class InMemoryRunLedger extends RunLedger {
  final case class Entry(fileName: String, location: String,
                         var status: String, created: Timestamp)
  private val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]

  override def activeFiles(fileNames: Seq[String]): Seq[String] =
    entries.filter(e => e.status == "A" && fileNames.contains(e.fileName))
      .map(_.fileName).distinct.toSeq

  override def markActive(fileName: String, location: String): Unit =
    entries += Entry(fileName, location, "A",
      new Timestamp(System.currentTimeMillis()))

  override def markInactive(fileNames: Seq[String]): Unit =
    entries.filter(e => fileNames.contains(e.fileName))
      .foreach(_.status = "I")

  def all: Seq[(String, String)] =
    entries.map(e => (e.fileName, e.status)).toSeq
}

/** Production implementation over plain JDBC (schema per
  * table_scripts.sql:1-8). Kept driver-side on purpose — a
  * distributed job for five control rows is the wrong tool.
  */
final class JdbcRunLedger(url: String, props: java.util.Properties,
                          table: String = "product_staging_table")
    extends RunLedger {
  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  override def activeFiles(fileNames: Seq[String]): Seq[String] =
    if (fileNames.isEmpty) Nil
    else withConn { c =>
      val marks = fileNames.map(_ => "?").mkString(",")
      val st = c.prepareStatement(
        s"SELECT DISTINCT file_name FROM $table WHERE file_name IN ($marks) AND status = 'A'")
      fileNames.zipWithIndex.foreach { case (f, i) => st.setString(i + 1, f) }
      val rs = st.executeQuery()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) out += rs.getString(1)
      out.toSeq
    }

  override def markActive(fileName: String, location: String): Unit =
    withConn { c =>
      val st = c.prepareStatement(
        s"INSERT INTO $table (file_name, file_location, created_date, status) VALUES (?, ?, ?, 'A')")
      st.setString(1, fileName)
      st.setString(2, location)
      st.setTimestamp(3, new Timestamp(System.currentTimeMillis()))
      st.executeUpdate()
    }

  override def markInactive(fileNames: Seq[String]): Unit =
    if (fileNames.nonEmpty) withConn { c =>
      val marks = fileNames.map(_ => "?").mkString(",")
      val st = c.prepareStatement(
        s"UPDATE $table SET status = 'I', updated_date = ? WHERE file_name IN ($marks)")
      st.setTimestamp(1, new Timestamp(System.currentTimeMillis()))
      fileNames.zipWithIndex.foreach { case (f, i) => st.setString(i + 2, f) }
      st.executeUpdate()
    }
}
