package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Semantics + plan posture for the ML-guardrail pack
  * ([[graft.queries.MlOps]]). */
class MlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_fold_assign: near-dup clusters never straddle a fold boundary") {
    // rebuild the per-doc fold map the aggregate is derived from, and
    // assert every mutant (doc_id + 1000000) folds with its source —
    // the leakage the operator exists to prevent
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val dm = d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zzmutant")).as("text")))
    val pairs = graft.operators.Dedup.minhashPairs(dm, col("text"),
      col("doc_id"), shingleSize = 3, k = 16, bands = 4, threshold = 0.5)
    val comp = graft.operators.Components.connectedComponents(
        pairs.select(col("id_a"), col("id_b")), dm.select(col("doc_id")))
      .select(col("id"), col("component"))
    val byDoc = comp.as[(Long, Long)].collect().toMap
    val sources = byDoc.keys.filter(_ < 1000000L)
    val paired = sources.count(id => byDoc.contains(id + 1000000L) &&
      byDoc(id + 1000000L) == byDoc(id))
    // the mutant fixture makes (almost) every source near-dup its mutant;
    // every detected pair shares a component ⇒ shares a fold
    assert(paired > sources.size / 2, s"only $paired/${sources.size} merged")
    // and the gate aggregate accounts for every doc exactly once
    val agg = SparkEntry.queries("q_fold_assign")(spark, sf).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum == byDoc.size)
    assert(agg.map(_.getAs[Long]("fold")).forall(f => f >= 0 && f < 5))
  }

  test("q_cohen_kappa: perfect agreement gives kappa = 1e6, exact formula") {
    // hand-check one lang against an independent local computation
    val rows = SparkEntry.queries("q_cohen_kappa")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, tp, fp, fn, tn, k) =>
      val n = tp + fp + fn + tn
      val e = BigInt(tp + fp) * (tp + fn) + BigInt(fn + tn) * (fp + tn)
      val num = BigInt(1000000) * (BigInt(n) * (tp + tn) - e)
      val den = BigInt(n) * n - e
      val expect = if (den == 0) None else Some((num / den).toLong)
      assert(expect.forall(_ == k), s"$lang kappa $k != $expect")
      assert(k <= 1000000L, s"$lang kappa above 1: $k")
    }
  }

  test("q_token_chi2: monotone in association — a pure-en token beats a " +
      "balanced one at equal df") {
    // synthetic check of the closed form on a constructed corpus
    import graft.queries.MlOps
    val out = SparkEntry.queries("q_token_chi2")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length <= 20 && out.nonEmpty)
    // descending order with deterministic tie-break
    assert(out.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // df window respected
    out.foreach { case (tok, a, b, _) => assert(a + b >= 25, tok) }
  }

  test("q_embed_simhash: signature is quantization-exact and buckets sum " +
      "to the corpus") {
    val out = SparkEntry.queries("q_embed_simhash")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(out.length == n)
    // signatures fit the declared 16 bits
    assert(out.forall { case (_, sig, _) => sig >= 0 && sig < (1L << 16) })
    // bucket_n is consistent: the histogram of sigs matches the carried count
    val hist = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach { case (id, sig, bn) =>
      assert(hist(sig) == bn, s"vec $id bucket count $bn != ${hist(sig)}")
    }
  }

  test("q_embed_neardup_lsh: multiprobe equi-join — keyed join plus heap, " +
      "never a cartesian") {
    val df = SparkEntry.queries("q_embed_neardup_lsh")(spark, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be a keyed equi-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-50 not heap-pruned:\n$p")
    // every returned pair really is within Hamming 1 of signatures, and
    // candidates at Hamming ≥ 2 are structurally unreachable via one probe
    val sigs = SparkEntry.queries("q_embed_simhash")(spark, sf)
      .select(col("vec_id"), col("sig")).as[(Long, Long)].collect().toMap
    val pairs = df.as[(Long, Long, Double)].collect()
    assert(pairs.length == 50)
    pairs.foreach { case (a, b, _) =>
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 1,
        s"pair ($a,$b) exceeds the probe radius")
    }
  }

  test("q_ngram_novelty: the earliest document is fully novel, ratios are " +
      "exact and bounded") {
    val out = SparkEntry.queries("q_ngram_novelty")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every gram of the minimum doc_id is first seen there by definition
    val first = out.minBy(_._1)
    assert(first._4 == 1000L, s"first doc must be fully novel: $first")
    out.foreach { case (id, n, novel, milli) =>
      assert(novel <= n && milli == 1000 * novel / n, s"doc $id ratio broken")
    }
  }

  test("q_calibration_bins: totals reconcile with the corpus and rates are " +
      "exact milli ratios") {
    val out = SparkEntry.queries("q_calibration_bins")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val n = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(out.map(_._2).sum == n, "every document lands in exactly one bin")
    out.foreach { case (bin, cnt, pos, rate) =>
      assert(pos <= cnt && rate == 1000 * pos / cnt, s"bin $bin rate broken")
    }
  }

  test("q_label_propagate: members partition the corpus, majority is " +
      "consistent") {
    val out = SparkEntry.queries("q_label_propagate")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(out.map(_._2).sum == n, "components partition the vector set")
    out.foreach { case (comp, members, _, nMaj) =>
      assert(nMaj >= 1 && nMaj <= members, s"component $comp majority broken")
    }
  }

  test("q_deletion_cascade: a seed's mutant is dropped with it (the " +
      "cascade property)") {
    // rebuild the per-doc flags and assert: every seed is dropped, and
    // every near-dup PAIR with a dropped member is fully dropped — the
    // compliance property the audit exists to certify
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val dm = d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zzmutant")).as("text")))
    val pairs = graft.operators.Dedup.minhashPairs(dm, col("text"),
      col("doc_id"), shingleSize = 3, k = 16, bands = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    val comp = graft.operators.Components.connectedComponents(
        graft.operators.Dedup.minhashPairs(dm, col("text"), col("doc_id"),
          shingleSize = 3, k = 16, bands = 4, threshold = 0.5)
          .select(col("id_a"), col("id_b")), dm.select(col("doc_id")))
      .select(col("id"), col("component")).as[(Long, Long)].collect().toMap
    val seedComps = comp.collect {
      case (id, c) if id % 97 == 0 => c }.toSet
    def dropped(id: Long) = seedComps.contains(comp(id))
    pairs.foreach { case (a, b) =>
      assert(dropped(a) == dropped(b),
        s"pair ($a,$b) straddles the deletion boundary")
    }
    // totals reconcile with the gate aggregate
    val agg = SparkEntry.queries("q_deletion_cascade")(spark, sf).collect()
    val total = agg.map(r => r.getAs[Long]("n_dropped") +
      r.getAs[Long]("n_kept")).sum
    assert(total == comp.size, s"accounting covers $total of ${comp.size}")
  }

  test("kmeans lloyd: members partition the corpus, result is " +
      "partitioning-invariant, clusters separate a bimodal fixture") {
    import graft.operators.KMeansLloyd
    // bimodal fixture: two tight integer clusters far apart
    val vecs = ((0 until 20).map(i => (i.toLong,
        Array.fill(4)(0.001f * (i % 3)))) ++
      (20 until 40).map(i => (i.toLong,
        Array.fill(4)(5.0f + 0.001f * (i % 3))))).toDF("vec_id", "embedding")
    val out = KMeansLloyd.summary(vecs, col("vec_id"), col("embedding"),
      k = 2, iters = 3).collect()
    assert(out.map(_.getAs[Long]("n_members")).sum == 40)
    // the two modes land in different clusters with equal mass
    assert(out.map(_.getAs[Long]("n_members")).toSet == Set(20L))
    // repartitioning must not change a single byte of the result
    val skewed = KMeansLloyd.summary(vecs.repartition(7), col("vec_id"),
      col("embedding"), k = 2, iters = 3).collect()
    assert(out.map(_.toString).sameElements(skewed.map(_.toString)))
    // and the gate query over the corpus accounts for every vector
    val gate = SparkEntry.queries("q_kmeans_lloyd")(spark, sf).collect()
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(gate.map(_.getAs[Long]("n_members")).sum == n)
  }

  test("q_ab_experiment: variants partition users, chi2 symmetric across " +
      "both rows") {
    // chi2 is NULL when the 2×2 table is degenerate (e.g. every user
    // converts at tiny SF — a zero marginal) — read it nullable
    val out = SparkEntry.queries("q_ab_experiment")(spark, sf)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(out.map(_._1).toSeq.sorted == Seq(0L, 1L))
    val users = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(out.map(_._2).sum == users, "every user in exactly one variant")
    out.foreach { case (_, n, conv, rate, _) =>
      assert(conv <= n && rate == 1000000L * conv / n)
    }
    // the chi2 statistic is a property of the whole table — equal rows
    assert(out.map(_._5).distinct.length == 1)
  }

  // Mutant fixture for the id-aliasing hazard (ADVICE r8): a corpus with
  // doc_id at/past the mutant offset (10¹² since round 14) would silently
  // alias a real doc as a mutant on BOTH engine and oracle — the guard
  // must fail loudly instead of letting the parity gate stay green over
  // wrong accounting.
  test("withMutants guard: doc_id past the offset fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("mutant-guard").toString
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + graft.queries.Parity.VariantOffset)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ex = intercept[Throwable] {
      graft.queries.MlOps.defs("q_fold_assign")(spark, tmp).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(ex).contains("offset no longer injective"),
      s"expected the offset guard to fire, got: ${messages(ex).take(500)}")
  }

  test("q_token_chi2 plans top-20 as TakeOrderedAndProject with broadcast " +
      "totals (no vocab collect)") {
    val p = SparkEntry.queries("q_token_chi2")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not heap-pruned:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row totals not broadcast:\n$p")
  }
}
