package graft

import org.apache.spark.sql.types._

/** Output-boundary contract (the r12 verdict's task #2): every gate's
  * emitted cells must hash identically through ANY engine pair, which
  * means no exact-typed cell may depend on a decimal→double conversion
  * above 2⁵³.
  *
  * Why this boundary: the three r12 hash failures (q_anova_f,
  * q_levene_bf, q_jackknife_ratio) were all VALUE-exact — rows and
  * schema matched and tools/parity.py passed at sf0.01 and sf0.1 — yet
  * the driver's hasher flagged them, because their DECIMAL(38,0) cells
  * sat above 2⁵³ where pyarrow's decimal128→float64 and DuckDB's
  * not-correctly-rounded HUGEINT→DOUBLE can round DIFFERENTLY on the
  * two sides of the compare. BIGINT cells are immune (int64 rides the
  * arrow/pandas path exactly, no double conversion), which is why
  * 64-bit hash/signature columns pass at any magnitude.
  *
  * The contract, per top-level output column:
  *   - DECIMAL (any scale): |v| < 2⁵³ — ALWAYS. A bigger decimal is a
  *     latent cross-engine hash flake even when value-exact; rescale
  *     the emitted unit (exact `div` on both engines) instead.
  *   - BIGINT: |v| < 2⁵³ unless the column is a declared 64-bit
  *     hash/signature/fingerprint (exact int64 end-to-end on both
  *     engines — allowlisted below by (query, column) so a NEW big
  *     long column still trips the spec and forces the author to
  *     classify it).
  *   - DOUBLE/FLOAT: intentional doubles, out of scope (their parity
  *     discipline is the shared-text closing-formula rule).
  *
  * Runs every registered gate at sf0.001 — the execution twin of
  * PlanSpec's plan sweep. Arrays/structs are not descended into: no
  * gate emits ARRAY<DECIMAL>, and nested int64 is exact regardless.
  */
class OutputContractSpec extends SparkSpec {

  private val TwoP53 = OutputContract.TwoP53

  /** Captured CodeGenerator compile failures (janino "Code grows beyond
    * 64 KB" and friends). A failed whole-stage compile silently falls
    * back to interpreted execution — correct results, hot loop 10×
    * slower, invisible to every green test — the r13 verdict caught two
    * such fallbacks in q_media_pipeline's unrolled BMP expressions. The
    * appender is installed before the sweeps so the two full-gate
    * executions double as the codegen-health probe; Spark's compile
    * cache never caches FAILURES, so a failing compile re-logs here even
    * if another suite hit it first. */
  private val codegenFailures =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def installCodegenCapture(): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender("graft-codegen-capture", null,
        null, false, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val msg = String.valueOf(e.getMessage.getFormattedMessage)
        if (msg.contains("Failed to compile") ||
            msg.contains("grows beyond"))
          codegenFailures.add(msg.linesIterator.take(2).mkString(" | "))
      }
    }
    appender.start()
    val cfg = ctx.getConfiguration
    cfg.getLoggerConfig(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
  }
  installCodegenCapture()

  /** The allowlist + sweep live in main source ([[OutputContract]]) so the
    * one-shot sf1 probe ([[ContractProbe]]) asserts the SAME contract the
    * suite sweeps — a probe with its own copy could drift. */
  private def sweep(dir: String, bound: BigDecimal): Seq[String] =
    OutputContract.sweep(spark, dir, bound)

  test("every gate's exact-typed output cells stay below 2^53 at sf0.001") {
    val violations = sweep(sf, TwoP53)
    assert(violations.isEmpty,
      s"cells at/above 2^53 — cross-engine hash-fragile; rescale the " +
        s"emitted unit or classify as a 64-bit hash:\n  " +
        violations.take(40).mkString("\n  "))
  }

  /** The r13 verdict's scale-headroom hole: a cell growing ∝sf (sums)
    * or ∝sf² (cross-terms) passes the sf0.001 sweep yet crosses 2⁵³ at
    * the scales the driver actually hashes. Sweep the LARGEST on-disk
    * corpus with a 10× headroom bound (2⁵³/10): any exact cell that
    * close to the boundary at sf0.1 is one decade of growth from a
    * cross-engine hash flake, which is exactly what caught the r12
    * dollars² fix sitting at 0.35·2⁵³. (An sf1 probe a decade further
    * up is run one-shot per round and recorded in PERF.md — the suite
    * sweeps the corpus every build can afford.) */
  test("every gate's exact-typed output cells keep 10x headroom below " +
      "2^53 at sf0.1 (scale-growth contract)") {
    val violations = sweep("/root/testdata/sf0.1", TwoP53 / 10)
    assert(violations.isEmpty,
      s"cells above 2^53/10 at sf0.1 — within one decade of the " +
        s"cross-engine hash boundary; rescale the emitted unit:\n  " +
        violations.take(40).mkString("\n  "))
  }

  test("no gate trips a CodeGenerator compile failure (silent interpreted " +
      "fallback) across the two full-gate sweeps") {
    // runs last in-suite (ScalaTest registration order): by now both
    // sweeps above have EXECUTED every registered gate at two scales
    val seen = codegenFailures.toArray(Array.empty[String]).distinct
    assert(seen.isEmpty,
      s"codegen compile failures logged during the sweeps — these plans " +
        s"run interpreted (10x slower hot loops), split the offending " +
        s"expressions:\n  ${seen.take(10).mkString("\n  ")}")
  }
}
