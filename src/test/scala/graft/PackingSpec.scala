package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.sources.Tables

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("packs respect the budget with at most one straddling doc") {
    val packed = Packing.byBudget(docs, Seq(col("lang")), col("doc_id"),
      col("n_chars"), budget = 10000L)
    val perPack = packed.groupBy(col("lang"), col("pack_id"))
      .agg(sum(col("n_chars")).as("w"), max(col("n_chars")).as("maxDoc"))
      .as[(String, Long, Long, Long)].collect()
    assert(perPack.nonEmpty)
    perPack.foreach { case (lang, pack, w, maxDoc) =>
      assert(w < 10000L + maxDoc,
        s"pack $lang/$pack holds $w with max doc $maxDoc")
    }
    // every pack except possibly the last per lang reaches the boundary:
    // the NEXT pack's existence implies this one's cumsum crossed it
    val packIds = perPack.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    packIds.foreach { case (lang, ids) =>
      assert(ids.head == 0L, s"$lang packs start at ${ids.head}")
    }
  }

  test("assignment is a pure function of the data (repartition-invariant)") {
    val a = Packing.byBudget(docs, Seq(col("lang")), col("doc_id"),
      col("n_chars"), 10000L)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)].collect().sorted
    val b = Packing.byBudget(docs.repartition(17), Seq(col("lang")),
      col("doc_id"), col("n_chars"), 10000L)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)].collect().sorted
    assert(a.sameElements(b))
  }

  test("pack ids are dense from zero and weights below budget share a pack") {
    val tiny = Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 75L), (4L, 30L))
      .toDF("id", "w")
    val packed = Packing.byBudget(tiny, Seq(lit(1)), col("id"), col("w"), 100L)
      .select(col("id"), col("pack_id")).as[(Long, Long)].collect().toMap
    // cum-before: 0,10,20,30,105 → packs 0,0,0,0,1
    assert(packed == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("invalid budget is rejected") {
    intercept[IllegalArgumentException] {
      Packing.byBudget(docs, Seq(col("lang")), col("doc_id"),
        col("n_chars"), 0L)
    }
  }
}
