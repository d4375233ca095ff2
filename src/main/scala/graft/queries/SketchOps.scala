package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash32, sqlHash32, sqlWordNgrams,
  wordNgramsNative}
import graft.sources.Tables

/** Round-12 tranche 16: sketch-calibration audits — the queries that
  * MEASURE a sketch's error against exact ground truth, continuing the
  * `q_minhash_calibration` discipline (a sketch you haven't audited is
  * a sketch you can't budget at 100 TB). Count-Min frequency
  * estimation (does the d×w counter grid's overestimate stay inside
  * its n/w guarantee on the real key distribution?) and Bloom-filter
  * false-positive rate (does the measured FPR of the gram pre-filter
  * track the (1 − e^{−kn/m})^k design point?).
  *
  * Determinism discipline: both sketches are EXACT objects here — the
  * counter grid and the bit-position set are deterministic functions
  * of the data through the portable [[hash32]] (md5-prefix, identical
  * in DuckDB), so measured counts/estimates hash-match exactly;
  * theoretical curves close as shared-text doubles over exact cells
  * (exp only — `pow` is never used; cubes are written x·x·x).
  *
  * Scale posture: CMS is ONE map-side-combinable (row, bucket)
  * aggregate over a d-fold narrow explosion (the grid is d·w = 1024
  * cells, a broadcast dim); the top-k exact side is the bounded
  * TakeOrdered shape. Bloom is two distinct-gram aggregates + one
  * broadcast semi/anti-join per probe — the positions table is ≤ m
  * bits = 65536 rows, always a broadcast dim; text never shuffles.
  */
object SketchOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val CmsD = 4
  private val CmsW = 256
  private val BloomK = 3
  private val BloomM = 65536

  /** Bloom theoretical FPR over exact cells, k = 3: t³ with
    * t = 1 − e^{−3n/m} (shared text; no pow). */
  private val bloomTheo =
    s"""((1.0 - exp(-3.0 * n_inserted / $BloomM.0))
       | * (1.0 - exp(-3.0 * n_inserted / $BloomM.0))
       | * (1.0 - exp(-3.0 * n_inserted / $BloomM.0)))"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Count-Min Sketch audit over part-key frequencies: build the 4×256
    // counter grid (bucket_r(k) = hash32('r:'||k) mod 256 — one narrow
    // 4-fold explode into ONE keyed aggregate), then compare the CMS
    // estimate (min over the 4 counters) against the exact count for
    // the 20 heaviest keys. CMS never underestimates — the audit's
    // overestimate column is ≥ 0 by construction (spec-pinned), and its
    // magnitude vs the n/w bound is the design readout.
    "q_cms_audit" -> ((s, dir) => {
      val keys = t(s, dir, "lineitem").select(col("l_partkey").as("pk"))
      val grid = keys
        .select(col("pk"), explode(expr(
          s"sequence(0, ${CmsD - 1})")).as("r"))
        .select(col("r"),
          pmod(hash32(concat(col("r").cast("string"), lit(":"),
            col("pk").cast("string"))), lit(CmsW)).as("bucket"))
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
      val exact = keys.groupBy(col("pk")).agg(count(lit(1)).as("exact"))
      val top = exact
        .orderBy(col("exact").desc, col("pk")).limit(20)
      val est = top
        .select(col("pk"), col("exact"), explode(expr(
          s"sequence(0, ${CmsD - 1})")).as("r"))
        .select(col("pk"), col("exact"), col("r"),
          pmod(hash32(concat(col("r").cast("string"), lit(":"),
            col("pk").cast("string"))), lit(CmsW)).as("bucket"))
        .join(broadcast(grid), Seq("r", "bucket"))
        .groupBy(col("pk"), col("exact"))
        .agg(min(col("cnt")).as("est"))
      est.select(col("pk"), col("exact"), col("est"),
          (col("est") - col("exact")).as("overestimate"),
          expr("(1000000 * (est - exact)) div exact").as("err_ppm"))
        .orderBy(col("exact").desc, col("pk"))
    }),

    // Bloom-filter FPR audit: insert the eval slice's distinct word
    // 3-grams (doc_id ≡ 0 mod 3) into an m=65536-bit, k=3 filter (the
    // bit-position SET is the filter — exact on both engines), probe
    // every train gram NOT in the eval set, and compare the measured
    // false-positive rate to the (1−e^{−kn/m})^k design curve. The
    // measured side is pure integer counting; the curve is a
    // shared-text double over the exact n_inserted cell.
    "q_bloom_fpr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val evalGrams = d.filter(col("doc_id") % 3 === 0)
        .select(explode(wordNgramsNative(col("text"), 3)).as("g"))
        .distinct().localCheckpoint()
      val trainGrams = d.filter(col("doc_id") % 3 =!= 0)
        .select(explode(wordNgramsNative(col("text"), 3)).as("g"))
        .distinct()
      val positions = evalGrams
        .select(explode(expr(s"sequence(0, ${BloomK - 1})")).as("i"),
          col("g"))
        .select(pmod(hash32(concat(col("i").cast("string"), lit(":"),
          col("g"))), lit(BloomM)).as("pos"))
        .distinct()
      val negatives = trainGrams.join(evalGrams, Seq("g"), "left_anti")
        .localCheckpoint()
      val probed = negatives
        .select(col("g"), explode(expr(
          s"sequence(0, ${BloomK - 1})")).as("i"))
        .select(col("g"),
          pmod(hash32(concat(col("i").cast("string"), lit(":"),
            col("g"))), lit(BloomM)).as("pos"))
        .join(broadcast(positions), Seq("pos"), "left_semi")
        .groupBy(col("g")).agg(count(lit(1)).as("hits"))
        .filter(col("hits") === BloomK)
        .agg(count(lit(1)).as("n_fp"))
      val cells = evalGrams.agg(count(lit(1)).as("n_inserted"))
        .crossJoin(broadcast(negatives.agg(count(lit(1)).as("n_neg"))))
        .crossJoin(broadcast(probed))
        .select(col("n_inserted"), col("n_neg"),
          coalesce(col("n_fp"), lit(0L)).as("n_fp"))
      // NULLIF: a corpus whose probe vocabulary saturates every n-gram
      // (the sf1 probe's 31-word synthetic vocab covers all 31³
      // trigrams in both halves) leaves NO negatives to measure FPR on
      // — emit NULL with the loud n_neg = 0 beside it rather than
      // dividing by zero (round 14; DuckDB NULLIF is identical).
      cells.select(col("n_inserted"), col("n_neg"), col("n_fp"),
        expr("(1000000 * n_fp) div NULLIF(n_neg, 0)").as("fpr_ppm"),
        round(expr(bloomTheo), 6).as("theo_fpr"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_cms_audit" -> {
      val h = sqlHash32("(r || ':' || pk)")
      s"""WITH keys AS (SELECT l_partkey AS pk FROM lineitem),
         |grid AS MATERIALIZED (
         |  SELECT r, $h % $CmsW AS bucket, COUNT(*) AS cnt
         |  FROM keys, unnest(generate_series(0, ${CmsD - 1})) AS u(r)
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT pk, COUNT(*) AS exact FROM keys GROUP BY 1),
         |top AS (
         |  SELECT pk, exact FROM exact
         |  ORDER BY exact DESC, pk LIMIT 20),
         |est AS (
         |  SELECT t.pk, t.exact, MIN(grid.cnt) AS est
         |  FROM (SELECT top.pk, top.exact, u.r,
         |          $h % $CmsW AS bucket
         |        FROM top, unnest(generate_series(0, ${CmsD - 1}))
         |          AS u(r)) t
         |  JOIN grid ON grid.r = t.r AND grid.bucket = t.bucket
         |  GROUP BY 1, 2)
         |SELECT pk, exact, est, est - exact AS overestimate,
         |  (1000000 * (est - exact)) // exact AS err_ppm
         |FROM est ORDER BY exact DESC, pk""".stripMargin
    },

    "q_bloom_fpr" -> {
      val grams = sqlWordNgrams("text", 3)
      val h = sqlHash32("(i || ':' || g)")
      s"""WITH ev AS MATERIALIZED (
         |  SELECT DISTINCT t.g
         |  FROM documents, unnest($grams) AS t(g)
         |  WHERE doc_id % 3 = 0),
         |tr AS MATERIALIZED (
         |  SELECT DISTINCT t.g
         |  FROM documents, unnest($grams) AS t(g)
         |  WHERE doc_id % 3 <> 0),
         |bpos AS MATERIALIZED (
         |  SELECT DISTINCT $h % $BloomM AS pos
         |  FROM ev, unnest(generate_series(0, ${BloomK - 1})) AS u(i)),
         |neg AS MATERIALIZED (
         |  SELECT g FROM tr WHERE g NOT IN (SELECT g FROM ev)),
         |probes AS (
         |  SELECT n.g, $h % $BloomM AS pos
         |  FROM neg n, unnest(generate_series(0, ${BloomK - 1}))
         |    AS u(i)),
         |fp AS (
         |  SELECT COUNT(*) AS n_fp FROM (
         |    SELECT g FROM probes
         |    WHERE pos IN (SELECT pos FROM bpos)
         |    GROUP BY g HAVING COUNT(*) = $BloomK)),
         |cells AS (
         |  SELECT (SELECT COUNT(*) FROM ev) AS n_inserted,
         |    (SELECT COUNT(*) FROM neg) AS n_neg,
         |    (SELECT n_fp FROM fp) AS n_fp)
         |SELECT CAST(n_inserted AS BIGINT) AS n_inserted,
         |  CAST(n_neg AS BIGINT) AS n_neg, CAST(n_fp AS BIGINT) AS n_fp,
         |  (1000000 * n_fp) // NULLIF(n_neg, 0) AS fpr_ppm,
         |  round($bloomTheo, 6) AS theo_fpr
         |FROM cells""".stripMargin
    }
  )
}
