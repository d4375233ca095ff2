package graft.operators

import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, UpdateSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame, Encoders}

/** Distinct-set overlap via theta sketches — "how much vocabulary do two
  * corpora share", "how many users appear in both streams" without
  * materializing either distinct set: each side compresses to a
  * fixed-size theta sketch (per partition, narrow, no shuffle; partials
  * union losslessly), and union/intersection estimates come from the two
  * small sketches. Below `nominalEntries` distinct keys a theta sketch
  * retains every hash (exact mode) — estimates are exact integers, the
  * regime the oracle gate pins; above it, estimates carry the published
  * relative-standard-error envelope (spec-tested at 200k keys).
  *
  * The per-side pass is the same sketch-then-merge shape as
  * [[HeavyHitters]]: ≤|partitions| serialized sketches (KBs) union into
  * one per side — a driver-side model artifact, never a data shuffle.
  */
object ThetaOverlap {

  private def sketchSide(df: DataFrame, keyCol: Column,
      nominalEntries: Int): CompactSketch = {
    val perPartition = df.select(keyCol.cast("string"))
      .na.drop()
      .map(_.getString(0))(Encoders.STRING)
      .mapPartitions { it =>
        val sk = UpdateSketch.builder().setNominalEntries(nominalEntries).build()
        it.foreach(sk.update)
        Iterator.single(sk.compact().toByteArray)
      }(Encoders.BINARY)
      .collect()
    val union = SetOperation.builder()
      .setNominalEntries(nominalEntries).buildUnion()
    perPartition.foreach(b => union.union(Sketches.wrapSketch(Memory.wrap(b))))
    union.getResult
  }

  /** One row: (n_left, n_right, n_shared, n_union) — distinct-key
    * estimates for each side, their intersection, and their union.
    * Exact (integer) below `nominalEntries` distinct keys per side. */
  def distinctOverlap(left: DataFrame, right: DataFrame, keyCol: Column,
      nominalEntries: Int = 4096): DataFrame = {
    require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
      s"nominalEntries must be a power of two >= 16, got $nominalEntries")
    val spark = left.sparkSession
    val l = sketchSide(left, keyCol, nominalEntries)
    val r = sketchSide(right, keyCol, nominalEntries)
    val inter: Intersection = SetOperation.builder().buildIntersection()
    inter.intersect(l)
    inter.intersect(r)
    val union = SetOperation.builder()
      .setNominalEntries(nominalEntries).buildUnion()
    union.union(l)
    union.union(r)
    import spark.implicits._
    Seq((math.round(l.getEstimate), math.round(r.getEstimate),
        math.round(inter.getResult.getEstimate),
        math.round(union.getResult.getEstimate)))
      .toDF("n_left", "n_right", "n_shared", "n_union")
  }
}
