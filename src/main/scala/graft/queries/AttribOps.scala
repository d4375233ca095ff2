package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-12 tranche 13: Markov-chain multi-touch attribution — the
  * removal-effect model that completes the attribution family
  * (`q_attribution` last-touch as-of, `q_attribution_linear` equal
  * split): build the user-journey transition matrix (start → channel →
  * … → conversion/null, truncated at the first conversion), solve the
  * absorbing-chain conversion probability, then re-solve with each
  * channel removed — a channel's credit is the conversion mass that
  * disappears without it. The industry-standard answer to "which
  * touchpoint actually CAUSES conversions" rather than "which happened
  * to be adjacent".
  *
  * Determinism discipline: the published statistic is the 64-ROUND
  * ITERATE of the integer-ppm recursion p_i ← (c_i→conv·10⁶ +
  * Σ_j c_ij·p_j) div n_i — monotone nondecreasing from 0, bounded by
  * 10⁶ and integer-valued, so it converges in finitely many rounds,
  * but NOT necessarily within 64 (a slowly-mixing chain can still be
  * climbing); the driver solve therefore runs one extra verification
  * round and fails LOUDLY if round 65 still moves (r12 advice — better
  * a loud error than silently publishing an unconverged approximant).
  * Cross-engine parity is round-exact regardless: Spark `div` ≡ DuckDB
  * HUGEINT `//` on the nonnegative operands and the oracle unrolls the
  * identical 64 rounds in SQL (the q_pagerank / q_kmeans_lloyd
  * unrolled-recurrence pattern) across all removal variants at once.
  *
  * Scale posture: the corpus-sized work is ONE pass — per-user
  * partitioned windows (prior-conversion cut, lag/lead transitions) +
  * one (prev,next)-keyed count. The transition matrix is ≤
  * (|event_type|+1)² cells — a bounded MODEL ARTIFACT (the
  * KMeansLloyd-centroid precedent), loudly guarded at 256 cells before
  * the driver-side 64-round solve over ≤ 6 states × 6 variants.
  * Envelope: c·p ≤ 10⁶·n — BigInt in the driver, HUGEINT in the
  * oracle; exact at any corpus size.
  *
  * Degenerate-input stance (documented, unreachable at gate scales): a
  * corpus with zero conversions zeroes p_base and every removal diff —
  * both engines then divide by zero (Spark null / DuckDB error), loud
  * either way.
  */
object AttribOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val Rounds = 64

  /** The journey transition frame (prev, next, c) BEFORE collection —
    * shared with [[SeqOps]]' entropy-rate readout, which consumes it
    * distributed. */
  private[queries] def transitionsDf(s: SparkSession,
      dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // journey truncation: drop everything strictly after the user's
    // first conversion (the purchase row itself stays — it becomes
    // the absorbing transition)
    val kept = e.withColumn("prior",
        coalesce(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("prior") === 0)
    val seq0 = kept
      .withColumn("prev",
        coalesce(lag(col("event_type"), 1).over(w), lit("start")))
      .withColumn("is_last", lead(col("event_type"), 1).over(w).isNull)
    seq0.select(col("prev"),
        when(col("event_type") === "purchase", "conv")
          .otherwise(col("event_type")).as("next"))
      .union(seq0.filter(col("is_last") &&
          col("event_type") =!= "purchase")
        .select(col("event_type").as("prev"), lit("null").as("next")))
      .groupBy(col("prev"), col("next")).agg(count(lit(1)).as("c"))
  }

  /** The transition matrix collected as a bounded model artifact, with
    * the 256-cell dimension guard making the envelope executable. */
  private def transitionMatrix(s: SparkSession, dir: String,
      what: String): Array[(String, String, Long)] = {
    val m = transitionsDf(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(m.length <= 256,
      s"$what: transition matrix ${m.length} cells exceeds " +
        "the bounded event-type envelope (256) - not a dim anymore")
    m
  }

  /** The fixed-round integer absorption solve over a transition
    * matrix with only `allowed` transient channels reachable. Runs
    * [[Rounds]] rounds (the published statistic — the oracle unrolls
    * the same count) plus ONE verification round that must not move:
    * the monotone bounded iteration provably converges, but not
    * provably within 64 rounds, so an unconverged chain fails loudly
    * instead of silently publishing the approximant (r12 advice). */
  private def absorb(m: Array[(String, String, Long)],
      allowed: String => Boolean): BigInt = {
    val states = m.map(_._1).distinct
    val n = m.groupBy(_._1).map { case (k, rs) =>
      k -> BigInt(rs.map(_._3).sum) }
    def step(p: Map[String, BigInt]): Map[String, BigInt] =
      states.map { st =>
        val num = m.filter(_._1 == st).map { case (_, nx, c) =>
          if (nx == "conv") BigInt(c) * 1000000
          else if (nx == "null" || !allowed(nx)) BigInt(0)
          else BigInt(c) * p.getOrElse(nx, BigInt(0))
        }.sum
        st -> num / n(st)
      }.toMap
    var p = states.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to Rounds) p = step(p)
    require(step(p) == p,
      s"absorption solve did not reach its fixed point in $Rounds " +
        "rounds - the published iterate would be an unconverged " +
        "approximant; raise Rounds (and the oracle unroll) together")
    p.getOrElse("start", BigInt(0))
  }

  override def defs: Map[String, Q] = Map[String, Q](

    "q_markov_attrib" -> ((s, dir) => {
      val m = transitionMatrix(s, dir, "q_markov_attrib")
      val channels = (m.map(_._1) ++ m.map(_._2)).distinct
        .filterNot(Set("start", "conv", "null")).sorted
      val pBase = absorb(m, _ => true)
      val rows = channels.map { ch =>
        val pc = absorb(m, _ != ch)
        (ch, pBase, pc, pBase - pc)
      }
      val td = rows.map(_._4).sum
      val out = rows.map { case (ch, pb, pc, d) =>
        (ch, pb.toLong, pc.toLong,
          (BigInt(1000000) * d / pb).toLong,
          (BigInt(1000000) * d / td).toLong)
      }
      import s.implicits._
      out.toSeq.toDF("channel", "p_base_ppm", "p_without_ppm",
          "removal_ppm", "share_ppm")
        .orderBy(col("channel"))
    }),

    // Shapley-value attribution — the axiomatic gold standard the
    // removal-effect model approximates: a channel's credit is its
    // average marginal contribution across ALL 2^k coalition orders,
    // φ_c = Σ_{S∌c} |S|!(k−1−|S|)!/k! · (v(S∪c) − v(S)), with the
    // coalition value v(S) = the absorption probability when only S's
    // channels are reachable (the same fixed-round integer solve).
    // 2^k coalition solves over the bounded matrix (k ≤ 8 guarded —
    // 256 solves max); weights stay exact integers by carrying k!·φ
    // and dividing once. Efficiency axiom Σφ = v(full) − v(∅) holds in
    // the integers up to one trunc per channel (spec-pinned).
    "q_shapley_attrib" -> ((s, dir) => {
      val m = transitionMatrix(s, dir, "q_shapley_attrib")
      val channels = (m.map(_._1) ++ m.map(_._2)).distinct
        .filterNot(Set("start", "conv", "null")).sorted
      val k = channels.length
      require(k <= 8,
        s"q_shapley_attrib: $k channels exceed the 2^k coalition " +
          "envelope (8) - the channel column is not a dim anymore")
      def fact(x: Int): Long = (1 to x).map(_.toLong).product
      val v = (0 until (1 << k)).map { cid =>
        val allowed = channels.zipWithIndex
          .filter { case (_, i) => ((cid >> i) & 1) == 1 }
          .map(_._1).toSet
        cid -> absorb(m, allowed.contains)
      }.toMap
      val phi24 = channels.zipWithIndex.map { case (ch, i) =>
        var acc = BigInt(0)
        for (cid <- 0 until (1 << k) if ((cid >> i) & 1) == 0) {
          val sz = java.lang.Integer.bitCount(cid)
          acc += BigInt(fact(sz)) * fact(k - 1 - sz) *
            (v(cid | (1 << i)) - v(cid))
        }
        (ch, acc)
      }
      val tot = phi24.map(_._2).sum
      val kf = BigInt(fact(k))
      val vFull = v((1 << k) - 1).toLong
      val vEmpty = v(0).toLong
      val out = phi24.map { case (ch, a) =>
        (ch, (a / kf).toLong, (BigInt(1000000) * a / tot).toLong,
          vFull, vEmpty)
      }
      import s.implicits._
      out.toSeq.toDF("channel", "shapley_ppm", "share_ppm",
          "v_full_ppm", "v_empty_ppm")
        .orderBy(col("channel"))
    })
  )

  /** The shared journey→transition-matrix CTE chain (flagged → kept →
    * seq → trans_raw → trans → n → cv → ch) — ONE definition across
    * both attribution oracles. */
  private[queries] val journeySql =
    """flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
      |        ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS prior
      |  FROM events),
      |kept AS MATERIALIZED (SELECT * FROM flagged WHERE prior = 0),
      |seq AS MATERIALIZED (
      |  SELECT user_id, event_type,
      |    COALESCE(LAG(event_type) OVER w, 'start') AS prev,
      |    (LEAD(event_type) OVER w IS NULL) AS is_last
      |  FROM kept
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |trans_raw AS MATERIALIZED (
      |  SELECT prev,
      |    CASE WHEN event_type = 'purchase' THEN 'conv'
      |      ELSE event_type END AS next
      |  FROM seq
      |  UNION ALL
      |  SELECT event_type, 'null' FROM seq
      |  WHERE is_last AND event_type <> 'purchase'),
      |trans AS MATERIALIZED (
      |  SELECT prev, next, COUNT(*) AS c FROM trans_raw GROUP BY 1, 2),
      |n AS MATERIALIZED (SELECT prev, SUM(c) AS n FROM trans GROUP BY 1),
      |cv AS MATERIALIZED (
      |  SELECT prev,
      |    SUM(CASE WHEN next = 'conv' THEN c ELSE 0 END) AS cv
      |  FROM trans GROUP BY 1),
      |ch AS MATERIALIZED (SELECT DISTINCT next AS ch FROM trans
      |       WHERE next NOT IN ('conv', 'null'))""".stripMargin

  override def oracle: Map[String, String] = Map(

    "q_markov_attrib" -> {
      val rounds = (1 to Rounds).map { k =>
        s"""p$k AS MATERIALIZED (
           |  SELECT v.v, n.prev AS s,
           |    (cv.cv * 1000000 + COALESCE(SUM(t.c * pj.val), 0)) // n.n
           |      AS val
           |  FROM n JOIN cv ON cv.prev = n.prev
           |  CROSS JOIN vr v
           |  LEFT JOIN trans t ON t.prev = n.prev
           |    AND t.next NOT IN ('conv', 'null') AND t.next <> v.v
           |  LEFT JOIN p${k - 1} pj ON pj.s = t.next AND pj.v = v.v
           |  GROUP BY v.v, n.prev, cv.cv, n.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH $journeySql,
         |vr AS MATERIALIZED (SELECT 'none' AS v UNION ALL SELECT ch FROM ch),
         |p0 AS MATERIALIZED (
         |  SELECT vr.v, n.prev AS s, CAST(0 AS HUGEINT) AS val
         |  FROM vr, n),
         |$rounds,
         |pb AS (SELECT val AS pbase FROM p$Rounds
         |       WHERE v = 'none' AND s = 'start'),
         |pc AS (SELECT v AS channel, val FROM p$Rounds
         |       WHERE v <> 'none' AND s = 'start'),
         |d AS (SELECT channel, pb.pbase AS pbase, val,
         |        pb.pbase - val AS diff FROM pc, pb),
         |tot AS (SELECT SUM(diff) AS td FROM d)
         |SELECT channel, CAST(pbase AS BIGINT) AS p_base_ppm,
         |  CAST(val AS BIGINT) AS p_without_ppm,
         |  CAST((1000000 * diff) // pbase AS BIGINT) AS removal_ppm,
         |  CAST((1000000 * diff) // tot.td AS BIGINT) AS share_ppm
         |FROM d, tot ORDER BY channel""".stripMargin
    },

    "q_shapley_attrib" -> {
      val rounds = (1 to Rounds).map { k =>
        s"""p$k AS MATERIALIZED (
           |  SELECT co.cid, n.prev AS s,
           |    (cv.cv * 1000000 + COALESCE(SUM(tm.c * pj.val), 0)) // n.n
           |      AS val
           |  FROM n JOIN cv ON cv.prev = n.prev
           |  CROSS JOIN co
           |  LEFT JOIN tm ON tm.prev = n.prev AND tm.cid = co.cid
           |  LEFT JOIN p${k - 1} pj ON pj.s = tm.next AND pj.cid = co.cid
           |  GROUP BY co.cid, n.prev, cv.cv, n.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH $journeySql,
         |chx AS MATERIALIZED (
         |  SELECT ch, ROW_NUMBER() OVER (ORDER BY ch) - 1 AS idx
         |  FROM ch),
         |kk AS (SELECT COUNT(*) AS k FROM chx),
         |co AS MATERIALIZED (
         |  SELECT u.cid FROM kk,
         |  unnest(generate_series(0,
         |    CAST(pow(2, kk.k) AS BIGINT) - 1)) AS u(cid)),
         |mem AS MATERIALIZED (
         |  SELECT co.cid, chx.ch
         |  FROM co, chx
         |  WHERE (co.cid // CAST(pow(2, chx.idx) AS BIGINT)) % 2 = 1),
         |tm AS MATERIALIZED (
         |  SELECT mem.cid, t.prev, t.next, t.c
         |  FROM trans t JOIN mem ON mem.ch = t.next),
         |sz AS MATERIALIZED (
         |  SELECT co.cid, COALESCE(cnt.c, 0) AS s
         |  FROM co LEFT JOIN (SELECT cid, COUNT(*) AS c FROM mem
         |    GROUP BY 1) cnt USING (cid)),
         |p0 AS MATERIALIZED (
         |  SELECT co.cid, n.prev AS s, CAST(0 AS HUGEINT) AS val
         |  FROM co, n),
         |$rounds,
         |vv AS MATERIALIZED (
         |  SELECT cid, val FROM p$Rounds WHERE s = 'start'),
         |phi AS (
         |  SELECT chx.ch AS channel,
         |    SUM(factorial(CAST(sz.s AS INT))
         |      * factorial(CAST(kk.k - 1 - sz.s AS INT))
         |      * (v1.val - v0.val)) AS phi24
         |  FROM chx CROSS JOIN kk
         |  JOIN sz ON (sz.cid // CAST(pow(2, chx.idx) AS BIGINT)) % 2 = 0
         |  JOIN vv v0 ON v0.cid = sz.cid
         |  JOIN vv v1 ON v1.cid = sz.cid + CAST(pow(2, chx.idx)
         |    AS BIGINT)
         |  GROUP BY 1),
         |tot AS (SELECT SUM(phi24) AS t FROM phi)
         |SELECT phi.channel,
         |  CAST(phi.phi24 // factorial(CAST(kk.k AS INT)) AS BIGINT)
         |    AS shapley_ppm,
         |  CAST((1000000 * phi.phi24) // tot.t AS BIGINT) AS share_ppm,
         |  (SELECT CAST(val AS BIGINT) FROM vv, kk
         |   WHERE cid = CAST(pow(2, kk.k) AS BIGINT) - 1) AS v_full_ppm,
         |  (SELECT CAST(val AS BIGINT) FROM vv WHERE cid = 0)
         |    AS v_empty_ppm
         |FROM phi, tot, kk ORDER BY phi.channel""".stripMargin
    }
  )
}
