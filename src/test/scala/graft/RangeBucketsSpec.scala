package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeBuckets

/** The r11-verdict task-4 contract for the bucketed-cumsum queries: the
  * bucket count behind `q_abc_class` / `q_mann_whitney` / `q_conformal`
  * is bounded by a CONSTANT — not by the value range — at gate scale,
  * at ×10 data, and under pathological value spreads.
  */
class RangeBucketsSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = RangeBuckets.DefaultTarget + 1L

  test("bucket count is ≤ target+1 and bucket is monotone in the value, " +
      "even for a range spanning 18 orders of magnitude") {
    // the shape the fixed div-2²² width could not bound: a single
    // outlier stretches the range to ~10¹⁸ — adaptive widths still land
    // in ≤ 257 buckets, and bucket order still tracks value order (the
    // property the offset-merge theta joins rely on)
    val wild = Seq(0L, 1L, 4096L, 4194304L, 1L << 40, (1L << 62) - 1)
      .toDF("v")
    val b = RangeBuckets.withRangeBucket(wild, "v")
      .select(col("v"), col("bucket")).as[(Long, Long)].collect().sortBy(_._1)
    assert(b.map(_._2).distinct.length <= Cap)
    assert(b.forall { case (_, bk) => bk >= 0 && bk <= Cap })
    assert(b.sliding(2).forall {
      case Array((v1, b1), (v2, b2)) => v1 > v2 || b1 <= b2
      case _ => true
    }, "bucket must be monotone in value")
    // degenerate single-value frame: one bucket, no div-by-zero
    val one = RangeBuckets.withRangeBucket(Seq(7L, 7L).toDF("v"), "v")
      .select(col("bucket")).as[Long].collect()
    assert(one.toSet == Set(0L))
  }

  test("gate-shape censuses stay ≤ target+1 buckets at sf0.001 AND ×10 " +
      "(sf0.01) — the q_abc_class / q_mann_whitney / q_conformal pin") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rev = graft.sources.Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("cents"))
      val nAbc = RangeBuckets.withRangeBucket(rev, "cents")
        .agg(countDistinct(col("bucket"))).as[Long].collect().head
      assert(nAbc <= Cap, s"$dir abc buckets $nAbc")
      val prices = graft.sources.Tables.load(spark, dir, "orders")
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("v")).distinct()
      val nMw = RangeBuckets.withRangeBucket(prices, "v")
        .agg(countDistinct(col("bucket"))).as[Long].collect().head
      assert(nMw <= Cap, s"$dir mann-whitney buckets $nMw")
    }
  }
}
