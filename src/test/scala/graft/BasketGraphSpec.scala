package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.BasketGraph

/** The census-cap contract of the shared basket-graph edge builder:
  * under the cap it is pure pairing (bit-identical to the uncapped
  * self-join), over the cap the oversized basket drops WHOLE with an
  * observable count, and per-task pair volume is bounded by C(cap, 2). */
class BasketGraphSpec extends SparkSpec {
  import spark.implicits._

  /** 30 small baskets (3–6 items each, deterministic) + one planted
    * mega-basket (id 999) with `megaSize` items. */
  private def baskets(megaSize: Int) = {
    val small = for {
      b <- 1 to 30
      i <- 0 until (3 + b % 4)
    } yield (b.toLong, (b * 7 + i * 13).toLong % 101)
    val mega = (0 until megaSize).map(i => (999L, 200L + i))
    (small ++ mega).distinct.toDF("ok", "pk")
  }

  private def uncappedPairs(df: org.apache.spark.sql.DataFrame) =
    df.as("a").join(df.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.ok").as("ok"), col("a.pk").as("u"), col("b.pk").as("v"))

  test("cap above the max basket is pure parallelism: capped == uncapped") {
    val df = baskets(megaSize = 10) // max basket 10 ≤ cap 64
    val capped = BasketGraph.pairs(df, "ok", "pk").as[(Long, Long, Long)]
      .collect().toSet
    val plain = uncappedPairs(df).as[(Long, Long, Long)].collect().toSet
    assert(capped == plain)
    assert(capped.nonEmpty)
  }

  test("planted mega-basket drops WHOLE, is observable, and bounds pair volume") {
    val cap = 16
    val df = baskets(megaSize = 400) // C(400,2) = 79,800 pairs if kept
    val obs = Observation("basket_drops")
    val pairs = BasketGraph.pairs(df, "ok", "pk", maxBasket = cap,
      drops = Some(obs))
    val got = pairs.as[(Long, Long, Long)].collect().toSet
    // dropped whole: NO pair from basket 999, not a truncated prefix
    assert(!got.exists(_._1 == 999L), "mega-basket must not contribute pairs")
    // everything else untouched
    val rest = uncappedPairs(df.filter(col("ok") =!= 999L))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == rest)
    // the drop is observable (cappedItems materializes the census, so the
    // metric is available as soon as the builder returns)
    assert(obs.get("dropped_baskets") == 1L)
    // bound: no surviving basket can emit more than C(cap, 2) pairs
    val perBasket = got.groupBy(_._1).map(_._2.size)
    assert(perBasket.forall(_ <= cap * (cap - 1) / 2))
  }

  test("edges and triples honor the same dropped-whole census") {
    val cap = 8
    val df = baskets(megaSize = 50)
    val e = BasketGraph.edges(df, "ok", "pk", maxBasket = cap)
      .as[(Long, Long)].collect().toSet
    val eRef = uncappedPairs(df.filter(col("ok") =!= 999L))
      .select(col("u"), col("v")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(e == eRef)
    val tri = BasketGraph.triples(df, "ok", "pk", maxBasket = cap)
    assert(tri.filter(col("ok") === 999L).isEmpty,
      "mega-basket contributes no triples")
    // small baskets' triples are exactly the uncapped ones
    val t = tri.as[(Long, Long, Long, Long)].collect().toSet
    val small = df.filter(col("ok") =!= 999L)
    val tRef = small.as("a")
      .join(small.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .join(small.as("c"),
        col("a.ok") === col("c.ok") && col("b.pk") < col("c.pk"))
      .select(col("a.ok"), col("a.pk"), col("b.pk"), col("c.pk"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(t == tRef)
  }

  test("TPC-H gate posture: default cap is far above the sf0.001 max basket") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val maxBasket = li.groupBy(col("ok")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(maxBasket < BasketGraph.DefaultMaxBasket / 4,
      s"TPC-H max basket $maxBasket should sit far under the default cap")
  }
}
