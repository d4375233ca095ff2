package graft

import org.apache.spark.sql.functions._
import graft.plans.BandJoin

/** Custom band-join operator (plans/BandJoin — logical node + strategy +
  * physical exec): results must equal the generic BETWEEN theta join for
  * every edge the sort+binary-search path could get wrong — inclusive
  * bounds, overlapping bands, duplicate lo values, null probe values, null
  * bounds, and an empty dimension. Plan shape: BandJoinExec with a
  * broadcast exchange on the dimension side.
  */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  // vals: like every Spark join API, frame() wants columns resolved from
  // the same DataFrame *instance* (a def would mint fresh exprIds per call)
  private lazy val facts = Seq[(Long, java.lang.Double)](
    (1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 10.5), (5L, 25.0),
    (6L, 39.9), (7L, 40.0), (8L, 100.0), (9L, -3.0), (10L, null))
    .toDF("id", "v")

  private lazy val dim = Seq[(java.lang.Double, java.lang.Double, String)](
    (0.0, 10.0, "a"),          // inclusive both ends
    (5.0, 25.0, "b"),          // overlaps a
    (5.0, 8.0, "c"),           // duplicate lo
    (25.0, 40.0, "d"),
    (60.0, 50.0, "e"),         // inverted: matches nothing
    (null, 99.0, "f"),         // null lo: matches nothing
    (90.0, null, "g"))         // null hi: matches nothing
    .toDF("lo", "hi", "band")

  test("band join ≡ generic BETWEEN join on every bound/null/overlap edge") {
    val custom = BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
      .select(col("id"), col("band"))
    val generic = facts.join(dim,
        facts("v") >= dim("lo") && facts("v") <= dim("hi"))
      .select(col("id"), col("band"))
    val a = custom.as[(Long, String)].collect().sorted
    val b = generic.as[(Long, String)].collect().sorted
    assert(a.nonEmpty && a.sameElements(b),
      s"custom=${a.mkString(",")} generic=${b.mkString(",")}")
  }

  test("band join against the corpus matches the generic join") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val bands = Seq((0.0, 10.0, "small"), (10.5, 25.0, "mid"),
      (25.5, 40.0, "large"), (40.5, 100.0, "huge")).toDF("lo", "hi", "band")
    val custom = BandJoin
      .frame(li, bands, li("l_quantity"), bands("lo"), bands("hi"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"))
    val generic = li.join(bands,
        li("l_quantity") >= bands("lo") && li("l_quantity") <= bands("hi"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"))
    val a = custom.as[(String, Long)].collect().sortBy(_._1)
    val b = generic.as[(String, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("left-outer band join keeps unmatched and null-value probes") {
    val custom = BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"),
        joinType = "left_outer")
      .select(col("id"), col("band"))
    val generic = facts.join(dim,
        facts("v") >= dim("lo") && facts("v") <= dim("hi"), "left_outer")
      .select(col("id"), col("band"))
    val a = custom.as[(Long, Option[String])].collect().sortBy(r => (r._1, r._2))
    val b = generic.as[(Long, Option[String])].collect().sortBy(r => (r._1, r._2))
    assert(a.sameElements(b), s"custom=${a.mkString(",")} generic=${b.mkString(",")}")
    // the null-v probe and the out-of-band probe survive with null bands
    assert(a.contains((10L, None)) && a.contains((8L, None)))
  }

  test("empty dimension joins to an empty result") {
    val empty = dim.filter(lit(false))
    val out = BandJoin.frame(facts, empty, facts("v"),
      empty("lo"), empty("hi"))
    assert(out.count() == 0)
  }

  test("strategy transparently claims a plain inclusive BETWEEN inner join") {
    graft.plans.GraftExtensions.registerAutoBandJoin(spark)
    val generic = facts.join(dim,
      facts("v") >= dim("lo") && facts("v") <= dim("hi"))
    val p = generic.queryExecution.executedPlan.toString
    assert(p.contains("BandJoin"),
      s"inclusive band join should be claimed by the strategy:\n$p")
    // and still computes the join faithfully
    val viaBnl = facts.crossJoin(dim)
      .filter(facts("v") >= dim("lo") && facts("v") <= dim("hi"))
      .select(col("id"), col("band"))
    val a = generic.select(col("id"), col("band"))
      .as[(Long, String)].collect().sorted
    val b = viaBnl.as[(Long, String)].collect().sorted
    assert(a.sameElements(b))
  }

  test("strategy falls through on strict bounds and extra conjuncts") {
    graft.plans.GraftExtensions.registerAutoBandJoin(spark)
    val strict = facts.join(dim,
      facts("v") >= dim("lo") && facts("v") < dim("hi"))
    assert(!strict.queryExecution.executedPlan.toString.contains("BandJoin"),
      "strict upper bound must use the built-in join")
    // a single-side extra conjunct is NOT a fall-through case: Catalyst
    // pushes it below the join, leaving a clean band condition the
    // strategy rightly claims — so the unclaimable shape needs an extra
    // conjunct referencing both sides
    val pushed = facts.join(dim,
      facts("v") >= dim("lo") && facts("v") <= dim("hi") &&
        dim("band") =!= "a")
    assert(pushed.queryExecution.executedPlan.toString.contains("BandJoin"),
      "single-side conjunct pushes down; band core should still be claimed")
    val extra = facts.join(dim,
      facts("v") >= dim("lo") && facts("v") <= dim("hi") &&
        facts("id") > dim("lo"))
    assert(!extra.queryExecution.executedPlan.toString.contains("BandJoin"),
      "a cross-side extra conjunct must use the built-in join")
    // long keys are not exact in double: falls through to the exact join
    val longFacts = Seq((1L, 9007199254740993L)).toDF("id", "v")
    val longDim = Seq((0L, 9223372036854775807L, "x")).toDF("lo", "hi", "band")
    val longJoin = longFacts.join(longDim,
      longFacts("v") >= longDim("lo") && longFacts("v") <= longDim("hi"))
    assert(!longJoin.queryExecution.executedPlan.toString.contains("BandJoin"),
      "bigint band keys must use the built-in exact comparison")
  }

  test("NaN bounds and probes follow Spark's total order (NaN greatest)") {
    val nanFacts = Seq((1L, 5.0), (2L, Double.NaN)).toDF("id", "v")
    val nanDim = Seq(
      (0.0, Double.NaN, "nanHi"),   // hi = NaN: matches any v (v <= NaN)
      (1.0, 2.0, "tight"),          // must NOT match v=5
      (Double.NaN, Double.NaN, "nanLo") // lo = NaN: only v = NaN reaches it
    ).toDF("lo", "hi", "band")
    val custom = BandJoin
      .frame(nanFacts, nanDim, nanFacts("v"), nanDim("lo"), nanDim("hi"))
      .select(col("id"), col("band"))
    val generic = nanFacts.join(nanDim,
        nanFacts("v") >= nanDim("lo") && nanFacts("v") <= nanDim("hi"))
      .select(col("id"), col("band"))
    val a = custom.as[(Long, String)].collect().sorted
    val b = generic.as[(Long, String)].collect().sorted
    assert(a.sameElements(b), s"custom=${a.mkString(",")} generic=${b.mkString(",")}")
    assert(a.contains((1L, "nanHi")) && !a.contains((1L, "tight")))
  }

  test("two band joins sharing one broadcast dimension use their own bounds") {
    // exchange reuse (spark.sql.exchange.reuse=true, the default) gives
    // both BandJoinExec nodes ONE BroadcastExchange and thus one broadcast
    // id — the executor-side sorted-dim cache must key on the bound lo/hi
    // shapes too, or the second join silently reuses the first join's
    // sorted bounds. Bands are arranged so that bug is visible: (lo1,hi1)
    // and (lo2,hi2) are swapped between the two dimension rows.
    // both joins must reference the same dimension columns or column
    // pruning gives them different scans and no reuse — so join 2 uses the
    // SAME (lo, hi) pair in swapped roles: band [hi, lo] is inverted
    // (matches nothing) except the point band where lo == hi.
    val swapDim = Seq((0.0, 10.0, "a"), (7.0, 7.0, "p"))
      .toDF("lo", "hi", "band")
    val f = Seq((1L, 5.0), (2L, 7.0)).toDF("id", "v")
    val r1 = BandJoin.frame(f, swapDim, f("v"), swapDim("lo"), swapDim("hi"))
      .select(col("id"), col("v"), col("band").as("band1"))
    val r2 = BandJoin.frame(r1, swapDim, r1("v"), swapDim("hi"), swapDim("lo"))
      .select(col("id"), col("band1"), col("band").as("band2"))
    // v=7 reaches the [7,7] point band in both orientations; v=5 matches
    // only in join 1 — a stale sorted-dim reuse would resurrect it.
    val ds = r2.as[(Long, String, String)]
    val got = ds.collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(Array((2L, "a", "p"), (2L, "p", "p"))),
      s"got=${got.mkString(",")}")
    // AQE materializes exchange reuse at runtime — check the final plan of
    // the dataset that actually executed
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"test must exercise the shared-broadcast path:\n$plan")
  }

  test("explicit frame refuses a dimension above the broadcast size guard") {
    spark.conf.set("spark.graft.bandJoin.maxBroadcastBytes", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
      }
      assert(e.getMessage.contains("broadcast guard"), e.getMessage)
    } finally spark.conf.unset("spark.graft.bandJoin.maxBroadcastBytes")
    // and the default guard admits the small dim unchanged
    assert(BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
      .count() > 0)
  }

  test("broadcast guard conf: malformed and zero values fail with the key named") {
    val key = "spark.graft.bandJoin.maxBroadcastBytes"
    for (bad <- Seq("10MB", "")) {
      spark.conf.set(key, bad)
      try {
        val e = intercept[IllegalArgumentException] {
          BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
        }
        assert(e.getMessage.contains(key), s"'$bad': ${e.getMessage}")
      } finally spark.conf.unset(key)
    }
    spark.conf.set(key, "0")
    try {
      val e = intercept[IllegalArgumentException] {
        BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
      }
      assert(e.getMessage.contains("reject every dimension"), e.getMessage)
    } finally spark.conf.unset(key)
    // any negative value disables the guard entirely
    spark.conf.set(key, "-42")
    try assert(BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
      .count() > 0)
    finally spark.conf.unset(key)
  }

  test("auto strategy leaves hinted joins to built-in planning") {
    graft.plans.GraftExtensions.registerAutoBandJoin(spark)
    val hinted = facts.join(dim.hint("broadcast"),
      facts("v") >= dim("lo") && facts("v") <= dim("hi"))
    val p = hinted.queryExecution.executedPlan.toString
    assert(!p.contains("BandJoin"),
      s"hinted join must keep built-in hint-aware planning:\n$p")
  }

  test("plan: BandJoinExec over a broadcast exchange on the dimension side") {
    val p = BandJoin.frame(facts, dim, facts("v"), dim("lo"), dim("hi"))
      .queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix: the physical node prints as "BandJoin"
    assert(p.contains("BandJoin"), s"custom exec missing:\n$p")
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"),
      s"dimension must broadcast:\n$p")
  }
}
