package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-15 data-selection / private-release tranche
  * ([[graft.queries.SelectOps]] + the MlOps q_semdedup gate): the DP
  * noise distribution is replayed against the closed-form geometric CDF,
  * DSIR's ordering property (target-language docs must out-score the
  * rest) is checked, and SemDeDup's planted variants are verified to
  * drop via an independent scalar cosine replay.
  */
class SelectOpsSpec extends SparkSpec {

  test("q_dp_count: |noise| ≤ clamp, deterministic across reruns, and " +
      "group counts are recovered within the truncation bound") {
    val truth = SparkEntry.queries("q_dp_count")(spark, sf) // trigger once
    val rows = truth.collect().map(r =>
      (r.getString(0), r.getAs[Long]("n_dp"))).toMap
    val real = graft.sources.Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    assert(rows.keySet === real.keySet)
    for ((k, nDp) <- rows) {
      assert(math.abs(nDp - real(k)) <= 8,
        s"$k: noise ${nDp - real(k)} escaped the ±8 clamp")
    }
    // determinism: the geometric draw is a pure function of the group key
    val again = SparkEntry.queries("q_dp_count")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_dp"))).toMap
    assert(again === rows, "DP release must be replay-stable")
    // the mechanism must actually perturb at least one cell at 5 groups
    // (P[all five draws = 0] = (1/3)^5 ≈ 0.4% — and the draw is fixed,
    // so this pins the fixture, not a probability)
    assert(rows.exists { case (k, v) => v != real(k) },
      "no group got nonzero noise — the when-chain is likely broken")
  }

  test("q_dp_topk: 5 rows, each within the noise clamp of its true " +
      "count, ranked by noised count with brand tie-break") {
    val out = SparkEntry.queries("q_dp_topk")(spark, sf).collect()
    assert(out.length == 5)
    val real = graft.sources.Tables.load(spark, sf, "part")
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    for (r <- out) {
      val b = r.getString(0); val nDp = r.getAs[Long]("n_dp")
      assert(math.abs(nDp - real(b)) <= 8,
        s"$b: noise ${nDp - real(b)} escaped the ±8 clamp")
    }
    // ranking is by the RELEASED (noised) counts, descending
    val released = out.map(_.getAs[Long]("n_dp"))
    assert(released.sameElements(released.sorted.reverse),
      "top-k not ordered by noised count")
  }

  test("q_dsir_weights: target-language docs dominate the top ranks and " +
      "per-gram weights stay in (0, 10^6]") {
    val rows = SparkEntry.queries("q_dsir_weights")(spark, sf).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val w = r.getAs[Long]("w_avg_ppm")
      assert(w >= 0 && w <= 1000000,
        s"doc ${r.getAs[Long]("doc_id")}: w_avg_ppm $w outside [0, 10^6]" +
          " — ct ≤ cr should cap the ratio at 1")
      assert(r.getAs[Long]("score") >=
        r.getAs[Long]("n_grams") * w, "floor(score/n) inconsistent")
    }
    // the top of the ranking must be dominated by the target slice: an
    // importance weighter that doesn't rank 'en' docs first is broken
    val enShare = rows.count(_.getAs[String]("lang") == "en")
    assert(enShare >= 15, s"only $enShare/20 top docs are target-lang")
  }

  test("q_dsir_sample: deterministic, kept ⊆ docs, and the target " +
      "language is kept at a higher rate than the rest pooled") {
    val rows = SparkEntry.queries("q_dsir_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("kept_grams")))
    assert(rows.nonEmpty)
    for ((lang, nd, nk, kg) <- rows) {
      assert(nk >= 0 && nk <= nd, s"$lang: kept $nk of $nd")
      assert(kg >= nk, s"$lang: kept docs must carry ≥ 1 gram each")
    }
    val (enD, enK) = rows.filter(_._1 == "en")
      .map(r => (r._2, r._3)).head
    val (otD, otK) = rows.filter(_._1 != "en")
      .foldLeft((0L, 0L)) { case ((d, k), r) => (d + r._2, k + r._3) }
    assert(enK * otD > otK * enD,
      s"en keep rate $enK/$enD must exceed the pooled rest $otK/$otD — " +
        "importance resampling must shift the mix toward the target")
    val again = SparkEntry.queries("q_dsir_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kept")))
    assert(again.toMap ==
      rows.map(r => (r._1, r._3)).toMap, "sample must be replay-stable")
  }

  test("q_dp_user_count: every type survives the hash-ranked selection, " +
      "contribution bounding bites, and the release is replay-stable") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"))
    val nUsers = ev.select(col("user_id")).distinct().count()
    val raw = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    val out = SparkEntry.queries("q_dp_user_count")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_dp"))).toMap
    // the salted-hash partition selection must spread kept types across
    // users — a fixed tie-break collapses the histogram to T types
    assert(out.keySet == raw.keySet,
      s"released types ${out.keySet} != corpus types ${raw.keySet}")
    for ((t, nDp) <- out) {
      // per-type ceiling: every user contributes ≤ Cap to a type
      assert(nDp <= nUsers * 3 + 8,
        s"$t: $nDp exceeds the n_users·Cap bound (+clamp)")
      assert(nDp <= raw(t) + 8, s"$t: released above raw + clamp")
    }
    // histogram ceiling: each user moves the whole release by ≤ Cap·T
    assert(out.values.sum <= nUsers * 6 + out.size * 8,
      "total release exceeds the Cap·Types user-level sensitivity bound")
    // bounding must BITE on this fixture (users are dense in types)
    assert(out.values.sum < raw.values.sum,
      "bounded release should sit well under the raw counts")
    val again = SparkEntry.queries("q_dp_user_count")(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_dp"))).toMap
    assert(again == out, "DP release must be replay-stable")
  }

  test("q_dp_ledger: the composition total equals the sum of the three " +
      "mechanisms' declared budgets, and each ε = sensitivity·ln 2") {
    val out = SparkEntry.queries("q_dp_ledger")(spark, sf).collect()
    assert(out.length == 4)
    val bySeq = out.map(r => r.getAs[Long]("seq") -> r).toMap
    val mechs = Seq(1L, 2L, 3L).map(bySeq)
    val total = bySeq(4L)
    assert(total.getAs[String]("mechanism") == "total")
    // declared budgets: event-level count 1·ln2, noisy-max top-k 1·ln2,
    // user-level histogram Cap·Types = 6·ln2 — the SAME constants the
    // release gates derive their guarantees from
    assert(mechs.map(_.getAs[Long]("sensitivity")) == Seq(1L, 1L, 6L))
    assert(mechs.map(_.getAs[String]("scope")) ==
      Seq("event", "event", "user"))
    // basic sequential composition: the total row IS the sum
    assert(total.getAs[Long]("sensitivity") ==
      mechs.map(_.getAs[Long]("sensitivity")).sum)
    assert(total.getAs[Long]("eps_micronats") ==
      mechs.map(_.getAs[Long]("eps_micronats")).sum)
    assert(total.getAs[Long]("n_cells") ==
      mechs.map(_.getAs[Long]("n_cells")).sum)
    // the micro-nat rendering is sensitivity · floor(10⁶·ln 2) per row
    for (r <- out)
      assert(r.getAs[Long]("eps_micronats") ==
        r.getAs[Long]("sensitivity") * 693147L)
    // the ledger censuses the RELEASED histograms: its user-level cell
    // count must equal the rows q_dp_user_count actually publishes
    val released = SparkEntry.queries("q_dp_user_count")(spark, sf).count()
    assert(bySeq(3L).getAs[Long]("n_cells") == released,
      "ledger must census the same bounded histogram it accounts for")
  }

  test("q_bpe_merges: matches an independent scalar BPE replay (list-" +
      "based greedy merge, not the string-replace the operator uses), " +
      "and merge counts never increase") {
    val out = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getAs[Long]("n_pair")))
      .sortBy(_._1)
    assert(out.length == 5)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3,
        s"round ${b._1} count ${b._3} exceeds round ${a._1}'s ${a._3} — " +
          "a merged pair cannot out-count the pair it came from")
    }
    // independent replay over the SAME census, with the canonical
    // left-to-right non-overlapping list merge (two derivations of the
    // greedy semantics agreeing is the point)
    import graft.functions.TextFunctions.{normalizeText, tokens}
    val census = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(tokens(normalizeText(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n")))
    var words = census.map { case (w, n) => (w.map(_.toString).toList, n) }
    def mergeOnce(syms: List[String], l: String, r: String): List[String] = {
      val b = List.newBuilder[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: c :: tail if a == l && c == r => b += (l + r); rest = tail
        case a :: tail => b += a; rest = tail
        case Nil => ()
      }
      b.result()
    }
    for ((round, pair, cnt) <- out) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; p <- syms.zip(syms.drop(1)))
        counts(p) = counts.getOrElse(p, 0L) + n
      val ((l, r), c) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a + " " + b) }
      assert(s"$l $r" == pair && c == cnt,
        s"round $round: replay picked ($l $r, $c), gate says ($pair, $cnt)")
      words = words.map { case (syms, n) => (mergeOnce(syms, l, r), n) }
    }
  }

  test("q_semdedup: planted near-duplicates drop, base vectors survive, " +
      "and a scalar cosine replay confirms each planted pair") {
    val out = SparkEntry.queries("q_semdedup")(spark, sf).collect()
    val members = out.map(_.getAs[Long]("n_members")).sum
    val dropped = out.map(_.getAs[Long]("n_dropped")).sum
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(members == 2 * n, "corpus must be base + planted variants")
    // every variant whose cluster kept its base must drop; tolerate
    // boundary vectors whose variant landed in a different cluster
    assert(dropped >= (n * 9) / 10,
      s"only $dropped of ~$n planted near-dups dropped")
    assert(dropped <= n, "a base vector dropped — keep-smallest-id broken")
    // independent scalar replay: quantize one base/variant pair exactly
    // as the operator does and confirm cos ≥ 0.85 via the same integer
    // cross-multiplication
    val v = graft.sources.Tables.load(spark, sf, "embeddings")
      .orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val a = v.map(x => math.round(x.toDouble * 1048576L))
    val b = v.map(x => math.round((x.toDouble + 0.001) * 1048576L))
    val dot = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val na2 = a.map(x => BigInt(x) * x).sum
    val nb2 = b.map(x => BigInt(x) * x).sum
    assert(dot > 0 && 400 * dot * dot >= 289 * na2 * nb2,
      "the planted +0.001 perturbation fell below the 0.85 threshold")
  }
}
