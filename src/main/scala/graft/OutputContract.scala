package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The output-boundary contract (r12 verdict task #2, extended r13→r14):
  * no exact-typed (DECIMAL / non-hash BIGINT) output cell may sit where a
  * decimal→double conversion can round differently across engines — i.e.
  * at or above 2⁵³. Shared by [[graft.OutputContractSpec]] (in-suite
  * sweeps at sf0.001 and sf0.1-with-headroom) and [[ContractProbe]] (the
  * one-shot per-round probe at the /tmp/sf1 decade, recorded in PERF.md).
  */
object OutputContract {

  val TwoP53 = BigDecimal(BigInt(1) << 53)

  /** Declared magnitude-free BIGINT columns: exact int64 cross-engine,
    * each with a reason. Keyed (query, column) so new big-long
    * emissions fail loudly until classified here.
    *  - q_simhash.simhash — a 64-bit fingerprint; magnitude IS the value
    *  - q_scd2_build.valid_to — the open-validity sentinel
    *    Long.MaxValue, emitted literally by both engines
    *  - q_try_arith.{add,mul}_maybe — try_add/try_multiply overflow
    *    probes whose POINT is to sit near the int64 edge
    *  - *_us / valid_from (CDC/SCD2 family) — epoch-MICROSECOND
    *    instants (~1.7×10¹⁵ ≈ 0.19·2⁵³): the magnitude IS the value,
    *    fixed by the calendar (not the corpus — 2⁵³ is year ~2255), and
    *    epoch_us/unix_micros are exact int64 end-to-end on both engines */
  val hashCols: Set[(String, String)] = Set(
    ("q_simhash", "simhash"),
    ("q_corpus_diff", "id_xor"), // bit_xor membership checksum (r14)
    ("q_scd2_build", "valid_to"),
    ("q_try_arith", "add_maybe"),
    ("q_try_arith", "mul_maybe"),
    ("q_cdc_apply", "last_us"),
    ("q_stream_cdc", "last_us"),
    ("q_stream_cdc_ttl", "last_us"),
    ("q_scd2_build", "valid_from"),
    ("q_scd2_asof", "probe_us"),
    ("q_scd2_asof", "since_us"))

  /** One gate's exact-typed cells vs `bound`: returns
    * (violations, maxCellAbs) — maxCellAbs over the gate's checked cells
    * (None when the gate emits no exact-typed columns). */
  private def checkGate(spark: SparkSession, dir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      bound: BigDecimal): (Seq[String], Option[BigDecimal]) = {
    val df = fn(spark, dir)
    val checked = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType.isInstanceOf[DecimalType] =>
        (f.name, i, "decimal")
      case (f, i) if f.dataType == LongType && !hashCols((name, f.name)) =>
        (f.name, i, "bigint")
    }
    if (checked.isEmpty) (Nil, None)
    else {
      val violations = scala.collection.mutable.ArrayBuffer[String]()
      var maxAbs = BigDecimal(0)
      var sawCell = false
      for (row <- df.collect(); (cn, i, kind) <- checked
           if !row.isNullAt(i)) {
        val v = kind match {
          case "decimal" => BigDecimal(row.getDecimal(i))
          case _ => BigDecimal(row.getLong(i))
        }
        sawCell = true
        if (v.abs > maxAbs) maxAbs = v.abs
        if (v.abs >= bound) violations += s"$name.$cn ($kind) = $v"
      }
      (violations.distinct.toSeq, if (sawCell) Some(maxAbs) else None)
    }
  }

  /** Sweep every gate at `dir`, collecting exact-typed cells at/above
    * `bound`. Returns violation strings (empty = contract holds). */
  def sweep(spark: SparkSession, dir: String, bound: BigDecimal): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      checkGate(spark, dir, name, fn, bound)._1
    }

  /** Sweep + per-gate max-cell magnitudes (as a fraction of 2⁵³), for the
    * probe's headroom report. A gate that throws at the probe corpus is
    * returned in the third seq (name → error) instead of aborting the
    * sweep — at a decade above the replay envelope an individual data
    * surprise must not hide every other gate's headroom reading. */
  def sweepWithHeadroom(spark: SparkSession, dir: String, bound: BigDecimal,
      nameFilters: Seq[String] = Nil)
      : (Seq[String], Seq[(String, Double)], Seq[(String, String)]) = {
    val errs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        nameFilters.isEmpty || nameFilters.exists(n.contains) }
      .map { case (name, fn) =>
      try {
        val (v, m) = checkGate(spark, dir, name, fn, bound)
        (v, m.map(x => name -> (x / TwoP53).toDouble))
      } catch { case e: Throwable =>
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => s"${t.getClass.getSimpleName}: " +
            String.valueOf(t.getMessage).take(200))
          .mkString(" <- ")
        errs += name -> chain
        (Nil, None)
      }
    }
    (all.flatMap(_._1), all.flatMap(_._2), errs.toSeq)
  }
}

/** One-shot contract probe: sweeps every gate at an arbitrary corpus
  * (default the /tmp/sf1 decade-up probe data) and prints the violations
  * plus the gates closest to the 2⁵³ boundary — the per-round evidence
  * PERF.md records so "the contract holds a decade above replay scale"
  * is a measurement, not an extrapolation.
  *
  * Usage: runMain graft.ContractProbe [dir=/tmp/sf1] [boundDiv=1] [name...]
  * (boundDiv divides 2⁵³, e.g. 10 asserts the sf0.1-style headroom rule;
  * trailing name substrings restrict the sweep for iteration.)
  */
object ContractProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val boundDiv = args.lift(1).map(BigDecimal(_)).getOrElse(BigDecimal(1))
    val nameFilters = args.drop(2).toSeq
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-contract-probe",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bound = OutputContract.TwoP53 / boundDiv
    val (violations, headroom, errs) =
      OutputContract.sweepWithHeadroom(spark, dir, bound, nameFilters)
    val top = headroom.sortBy(-_._2).take(20)
      .map { case (n, f) => f"$n%-28s ${f}%.6f" }
    println(s"[probe] dir=$dir bound=2^53/${boundDiv} gates=${headroom.length}")
    println(s"[probe] top max-cell / 2^53 fractions:\n  " +
      top.mkString("\n  "))
    if (errs.nonEmpty)
      println(s"[probe] gates erroring at this corpus (${errs.length}):\n  " +
        errs.map { case (n, e) => s"$n: $e" }.mkString("\n  "))
    if (violations.nonEmpty) {
      println(s"[probe] VIOLATIONS (${violations.length}):\n  " +
        violations.take(40).mkString("\n  "))
      spark.stop(); sys.exit(1)
    }
    if (errs.nonEmpty) {
      // A partial sweep is NOT a clean pass: gates that threw at this
      // corpus may hide violations. Exit 2 so automation keying on the
      // exit code can tell "clean" (0) from "incomplete" (2) from
      // "violated" (1).
      println("[probe] contract holds on every gate that ran — " +
        s"INCOMPLETE sweep (${errs.length} gates erred), exiting 2")
      spark.stop(); sys.exit(2)
    }
    println("[probe] contract holds")
    spark.stop()
  }
}
