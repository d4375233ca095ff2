package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's function surface for SQL use
  * (`SELECT st_askml(geom) FROM ...`), the `SparkSessionExtensions`
  * registration path of SURVEY §4. Attach with
  * `.withExtensions(new GraftExtensions)` or call [[GraftExtensions.register]]
  * on a live session.
  *
  * Two registration shapes: [[Hash32Expr]] is a native expression; the
  * geometry/text functions are Column compositions of built-ins, registered
  * by round-tripping argument Expressions through the Column API — the
  * resulting expression tree is the same one the Scala API builds, so SQL
  * and Column callers share plans (and codegen) exactly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.hash32Descriptor)
}

object GraftExtensions {
  import org.apache.spark.sql.graft.ColumnBridge
  import graft.functions.{GeoFunctions, TextFunctions}

  private def hash32Builder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "graft_hash32 takes exactly one argument")
    Hash32Expr(args.head)
  }

  private[plans] val hash32Descriptor =
    (FunctionIdentifier("graft_hash32"),
      new ExpressionInfo(classOf[Hash32Expr].getName, "graft_hash32"),
      (args: Seq[Expression]) => hash32Builder(args))

  /** Column-composition functions exposed to SQL (1-arg each). */
  private val columnFns: Map[String, Column => Column] = Map(
    "st_asgeojson" -> GeoFunctions.st_asgeojson,
    "st_askml" -> GeoFunctions.st_askml,
    "st_envelope" -> GeoFunctions.st_envelope,
    "st_envelope_polygon" -> GeoFunctions.st_envelope_polygon,
    "st_geomfromgeojson" -> GeoFunctions.st_geomfromgeojson,
    "st_points" -> GeoFunctions.st_points,
    "st_npoints" -> GeoFunctions.st_npoints,
    "st_x" -> GeoFunctions.st_x,
    "st_y" -> GeoFunctions.st_y,
    "graft_fingerprint" -> TextFunctions.fingerprint,
    "graft_normalize" -> TextFunctions.normalizeText,
    "graft_tokens" -> TextFunctions.tokens,
    "graft_langid" -> TextFunctions.langId)

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash32", hash32Builder, "built-in")
    columnFns.foreach { case (name, fn) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name takes exactly one argument")
          ColumnBridge.resolvedExpression(fn(ColumnBridge.column(args.head)))
        },
        "built-in")
    }
  }

  /** Column-API form of the native expression (Spark 4 classic-converter
    * path: Column wraps a ColumnNode, built from the raw Expression). */
  def graft_hash32(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Hash32Expr(ColumnBridge.expression(c)))
  }
}
