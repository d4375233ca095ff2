package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions for SQL use
  * (`SELECT graft_hash32(text) FROM ...`), the `SparkSessionExtensions`
  * registration path of SURVEY §4. Attach with
  * `.withExtensions(new GraftExtensions)` or call [[GraftExtensions.register]]
  * on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.hash32Descriptor)
}

object GraftExtensions {
  private def hash32Builder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "graft_hash32 takes exactly one argument")
    Hash32Expr(args.head)
  }

  private[plans] val hash32Descriptor =
    (FunctionIdentifier("graft_hash32"),
      new ExpressionInfo(classOf[Hash32Expr].getName, "graft_hash32"),
      (args: Seq[Expression]) => hash32Builder(args))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash32", hash32Builder, "built-in")

  /** Column-API form of the native expression (Spark 4 classic-converter
    * path: Column wraps a ColumnNode, built from the raw Expression). */
  def graft_hash32(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Hash32Expr(ColumnBridge.expression(c)))
  }
}
