package graft

import org.apache.spark.sql.functions._

/** Semantics for q_capture_recapture ([[graft.queries.DedupAuditOps]]):
  * scalar replay of the census pair counts off the raw documents table,
  * plus the estimator laws — the overlap is exactly the
  * both-bits-unmutated stratum, and the estimate brackets the planted
  * truth within the declared front-collision noise factor.
  */
class DedupAuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_capture_recapture equals the scalar census replay and the " +
      "estimate brackets the planted truth") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val all = docs.map(_._2) ++ docs.map { case (id, text) =>
      (if (id % 2 == 1) "Z" else "") + text +
        (if ((id / 2) % 2 == 1) "Z" else "")
    }
    def fpF(t: String) = t.take(32)
    def fpB(t: String) = t.substring(math.max(0, t.length - 32))
    def pairs[K](key: String => K): Long =
      all.groupBy(key).values.map(g =>
        g.length.toLong * (g.length - 1) / 2).sum
    val n1 = pairs(fpF)
    val n2 = pairs(fpB)
    val m = pairs(t => (fpF(t), fpB(t)))
    val row = SparkEntry.queries("q_capture_recapture")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_front") == n1)
    assert(row.getAs[Long]("n_back") == n2)
    assert(row.getAs[Long]("n_both") == m)
    assert(row.getAs[Long]("truth_pairs") == docs.length.toLong)
    assert(row.getAs[Long]("est_lp") == n1 * n2 / m)
    assert(row.getAs[Long]("est_chapman") ==
      (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    // the independent-bits design makes the catches independent on the
    // PLANTED pairs; incidental same-prefix collisions between
    // unrelated docs inflate n1 (never n2: a 'Z' suffix breaks back
    // agreement) so the estimate overshoots by at most that factor
    val truth = docs.length.toLong
    assert(row.getAs[Long]("est_lp") >= truth,
      "LP cannot undershoot here: n2 and m count exactly the planted strata")
    assert(row.getAs[Long]("est_lp") <= truth * 3 / 2,
      s"front-collision noise beyond the declared band: " +
        s"${row.getAs[Long]("est_lp")} vs truth $truth")
  }
}
