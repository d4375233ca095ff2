package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("hash sample is deterministic and partitioning-invariant") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select(col("doc_id")).as[Long].collect().sorted
    val b = Sampling.hashSample(docs.repartition(13), col("doc_id"), 0.3)
      .select(col("doc_id")).as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("nested rates compose: the 10% sample is a subset of the 50% sample") {
    val small = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select(col("doc_id")).as[Long].collect().toSet
    val big = Sampling.hashSample(docs, col("doc_id"), 0.5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("rate endpoints: 0 keeps none, 1 keeps all") {
    val n = docs.count()
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0L)
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == n)
  }

  test("sampled fraction tracks the rate (hash uniformity)") {
    // 10k synthetic keys: the md5-derived gate should land within a few
    // points of the nominal rate
    val ids = spark.range(10000).toDF("doc_id")
    val kept = Sampling.hashSample(ids, col("doc_id"), 0.3).count()
    assert(math.abs(kept / 10000.0 - 0.3) < 0.03, s"kept $kept of 10000")
  }

  test("stratified rates are respected per stratum") {
    val ids = spark.range(10000)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(2)) === 0, "en").otherwise("de").as("lang"))
    val sampled = Sampling.stratifiedHashSample(ids, col("doc_id"),
      col("lang"), Map("en" -> 0.6), defaultRate = 0.1)
    val byLang = sampled.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 5000.0 - 0.6) < 0.05)
    assert(math.abs(byLang("de") / 5000.0 - 0.1) < 0.05)
  }

  test("membership is consistent across tables sharing the key") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"))
    val sampledDocs = Sampling.hashSample(docs, col("doc_id"), 0.4)
      .select(col("doc_id")).as[Long].collect().toSet
    val sampledEmb = Sampling.hashSample(emb, col("doc_id"), 0.4)
      .select(col("doc_id")).as[Long].collect().toSet
    val docIds = docs.select(col("doc_id")).as[Long].collect().toSet
    val embIds = emb.select(col("doc_id")).as[Long].collect().toSet
    assert(sampledDocs.intersect(embIds) == sampledEmb.intersect(docIds))
  }

  test("exact-N per-stratum sample: exact counts, reproducible, " +
      "partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TopK.perGroup(
          df.select(col("lang"), col("doc_id"),
            (-hash32(col("doc_id").cast("string"))).cast("double")
              .as("neg_h")),
          Seq("lang"), col("neg_h"), col("doc_id"), k = 30)
        .orderBy(col("lang"), col("rank"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq
    val a = run(docs)
    // every stratum yields exactly min(30, stratum size) rows, ranks 1..n
    val sizes = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length == math.min(30L, sizes(lang)).toInt, s"$lang")
      assert(rows.map(_._3).sorted == (1 to rows.length), s"$lang ranks")
    }
    assert(a == run(docs.repartition(13)), "sample not partitioning-invariant")
  }

  test("invalid rates are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.hashSample(docs, col("doc_id"), 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedHashSample(docs, col("doc_id"), col("lang"),
        Map("en" -> -0.1), 0.5)
    }
  }
}
