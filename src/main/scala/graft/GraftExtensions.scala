package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.NormalizeWord

/** Session-extension entry point: build a session with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or pass
  * the same pair to spark-submit) and the engine's functions resolve in
  * SQL text without imperative registration.
  *
  * This is the deployment path for a shared cluster: the extension rides
  * in the application jar and every session — JDBC, notebook,
  * spark-submit — sees the same function surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("normalize_word"),
      new ExpressionInfo(classOf[NormalizeWord].getName, "normalize_word"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NormalizeWord(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.CollapseNormalizeWord)
  }
}
