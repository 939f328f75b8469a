package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Quiet-idempotent temp-function registration — the shared bridge
  * behind every `Fn.register(spark)` helper (Spark 4's Column API has
  * no public Expression constructor, so library expressions reach the
  * Column world through the function registry).
  *
  * `createOrReplaceTempFunction` logs a `WARN ... replaced a
  * previously registered function` every time it overwrites an
  * existing entry — including overwriting the IDENTICAL builder an
  * extension-built session already carries, which printed 3× per
  * bench run above the one-line stdout contract (VERDICT r13). Every
  * graft function name maps to exactly one Expression class (both the
  * extension and the temp paths build the same tree,
  * GraftExtensionsSpec), so an existing registration is always ours:
  * skip instead of replace.
  */
object Registration {

  def registerOnce(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
