package graft.operators

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame, Encoders}

/** Approximate heavy hitters (frequent items) over a key stream — "which
  * tokens/domains/urls dominate this corpus" WITHOUT a corpus-wide
  * group-by: the Misra-Gries-family ItemsSketch (Apache DataSketches,
  * shipped with Spark) holds a fixed `maxMapSize`-entry summary whatever
  * the key cardinality, so a 100 TB stream with billions of distinct keys
  * costs O(maxMapSize) memory per task and one tiny merge — against the
  * exact group-by's full-cardinality shuffle.
  *
  * Shape: one `mapPartitions` pass builds a sketch per partition (narrow,
  * no shuffle — the classic sketch-then-merge contract: merged partial
  * sketches ≡ one sketch's guarantees); the ≤|partitions| serialized
  * sketches (a few KB each) merge into the final summary, a small driver
  * artifact like the IVF quantizer. Guarantees (NO_FALSE_NEGATIVES):
  * every item with true count > εN is reported, and each reported
  * estimate brackets the truth within the sketch's error bound. With
  * `maxMapSize` ≥ the stream's distinct-key count the sketch never
  * evicts and all counts are EXACT — the regime the oracle gate pins;
  * the approximation guarantee on an over-cardinality stream is
  * spec-tested with a planted heavy hitter.
  */
object HeavyHitters {

  /** Top-`k` frequent items of `keyCol` (cast to string):
    * (item, estimate, lower_bound, upper_bound), ordered by
    * (estimate desc, item) for determinism under ties. */
  def topK(df: DataFrame, keyCol: Column, k: Int,
      maxMapSize: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(maxMapSize >= 2 && (maxMapSize & (maxMapSize - 1)) == 0,
      s"maxMapSize must be a power of two >= 2, got $maxMapSize")
    val spark = df.sparkSession
    val serde = new ArrayOfStringsSerDe
    val perPartition = df.select(keyCol.cast("string"))
      .na.drop()
      .map(_.getString(0))(Encoders.STRING)
      .mapPartitions { it =>
        val sk = new ItemsSketch[String](maxMapSize)
        it.foreach(sk.update)
        Iterator.single(sk.toByteArray(new ArrayOfStringsSerDe))
      }(Encoders.BINARY)
      .collect() // ≤ |partitions| few-KB payloads — a model artifact
    val merged = new ItemsSketch[String](maxMapSize)
    perPartition.foreach { bytes =>
      merged.merge(ItemsSketch.getInstance(Memory.wrap(bytes), serde))
    }
    val rows = merged.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (item, est, _, _) => (-est, item) }
      .take(k)
    import spark.implicits._
    rows.toSeq.toDF("item", "estimate", "lower_bound", "upper_bound")
  }
}
