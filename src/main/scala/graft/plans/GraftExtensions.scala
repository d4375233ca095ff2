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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.hash32Descriptor)
    GraftExtensions.nativeDescriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => BandJoinStrategy)
    // building a session with the extensions is the explicit opt-in that
    // also enables transparent claiming of plain BETWEEN joins
    ext.injectPlannerStrategy(_ => BandJoinAutoStrategy)
  }
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

  /** Foldable-int extraction for SQL-side kernel parameters (shingle size,
    * signature width): the kernels bind them at plan time, so only literal
    * ints are accepted. */
  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a literal integer parameter, got $other")
  }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn takes exactly $n arguments")

  /** Native-kernel SQL builders (§2.9 surface for the round-2 kernels). */
  private[plans] val nativeBuilders: Map[String, Seq[Expression] => Expression] = Map(
    "graft_word_ngrams" -> { args =>
      arity(args, 2, "graft_word_ngrams")
      WordNgramsExpr(args.head, intArg(args(1), "graft_word_ngrams"))
    },
    "graft_minhash_sig" -> { args =>
      arity(args, 3, "graft_minhash_sig")
      MinhashSigExpr(args.head, intArg(args(1), "graft_minhash_sig"),
        intArg(args(2), "graft_minhash_sig"))
    },
    "graft_simhash64" -> { args =>
      arity(args, 1, "graft_simhash64")
      Simhash64Expr(args.head)
    },
    "graft_winnow_fingerprint" -> { args =>
      arity(args, 3, "graft_winnow_fingerprint")
      WinnowFingerprintExpr(args.head,
        intArg(args(1), "graft_winnow_fingerprint"),
        intArg(args(2), "graft_winnow_fingerprint"))
    },
    "graft_cosine" -> { args =>
      arity(args, 2, "graft_cosine")
      CosineSimExpr(args.head, args(1))
    },
    "graft_dot_long" -> { args =>
      arity(args, 2, "graft_dot_long")
      DotLongExpr(args.head, args(1))
    })

  private[plans] val nativeDescriptors = nativeBuilders.toSeq.map {
    case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder)
  }

  /** Column-composition functions exposed to SQL (1-arg each). */
  private val columnFns: Map[String, Column => Column] = Map(
    "st_asgeojson" -> GeoFunctions.st_asgeojson,
    "st_askml" -> GeoFunctions.st_askml,
    "st_envelope" -> GeoFunctions.st_envelope,
    "st_envelope_polygon" -> GeoFunctions.st_envelope_polygon,
    "st_geomfromgeojson" -> GeoFunctions.st_geomfromgeojson,
    "st_geomfromkml" -> GeoFunctions.st_geomfromkml,
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
    nativeBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
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

  /** Idempotent registration of the explicit-node strategy on a live
    * session (the `withExtensions` path injects it at session build
    * instead). Does NOT enable transparent claiming of plain joins —
    * that changes how unrelated queries plan, so it stays a separate
    * opt-in ([[registerAutoBandJoin]]). */
  def registerStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(BandJoinStrategy))
      spark.experimental.extraStrategies = BandJoinStrategy +: cur
  }

  /** Session-level opt-in: plain inclusive BETWEEN inner joins with a
    * broadcast-sized right side are claimed by [[BandJoinExec]]. */
  def registerAutoBandJoin(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(BandJoinAutoStrategy))
      spark.experimental.extraStrategies = BandJoinAutoStrategy +: cur
  }

  /** Column-API form of the native expression (Spark 4 classic-converter
    * path: Column wraps a ColumnNode, built from the raw Expression). */
  def graft_hash32(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Hash32Expr(ColumnBridge.expression(c)))
  }
}
