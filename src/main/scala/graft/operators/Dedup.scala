package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication family for large-scale training-data pipelines
  * (SURVEY §2.11). Four escalating strategies, each with a distinct
  * cost/recall point:
  *
  *  - [[exact]] — hash group-by on a content fingerprint. One shuffle on the
  *    fingerprint; at 100 TB this is the cheapest full-corpus pass (the
  *    md5 key is 16 bytes regardless of document size, so the shuffle
  *    carries keys + ids, never text).
  *  - [[minhashPairs]] — MinHash + LSH banding: shingle → k-hash signature →
  *    band keys → *bucket join*. The only join is |bucket|² within buckets,
  *    never corpus×corpus; recall/precision tuned by (k, bands) in the
  *    standard S-curve. The scale path for near-dup text dedup.
  *  - [[simhashGroups]] — SimHash: one 32-bit sketch per doc, exact-match
  *    grouping (Hamming-0). O(n) shuffle on a 8-byte key.
  *  - [[ngramJaccard]] — exact n-gram Jaccard on *candidate pairs only*;
  *    the verifier stage behind MinHash candidates, never run all-pairs.
  */
object Dedup {

  /** Exact dedup: one row per distinct normalized content, with the
    * canonical (min) id and the duplicate count. */
  def exact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(fingerprint(textCol).as("fingerprint"), idCol.as("id"))
      .groupBy(col("fingerprint"))
      .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature table: (id, sig ARRAY<BIGINT>[k]) via
    * the native one-pass kernel (plans/MinhashSigExpr — codegen'd, no
    * intermediate arrays; ≡ the staged composed form, TextKernelsSpec). */
  def minhashSignatures(df: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3, k: Int = 16): DataFrame =
    df.select(idCol.as("id"),
      minhashSigNative(textCol, shingleSize, k).as("sig"))

  /** LSH banding → candidate pairs (id_a < id_b) whose estimated Jaccard
    * (signature agreement rate) ≥ `threshold`.
    *
    * Plan shape: signatures (narrow, one md5 per shingle) → explode k/bands
    * band-keys per doc → ONE shuffle on band-key → per-bucket pair
    * expansion from the collected bucket (no self-join: signatures are
    * computed once, and the only join-like work is Σ|bucket|² inside each
    * group) → distinct pairs → agreement filter. At 100 TB the band-key
    * shuffle carries (16-byte key, id, k longs) per doc — never text. */
  def minhashPairs(df: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sigs = minhashSignatures(df, textCol, idCol, shingleSize, k)

    val banded = sigs.select(col("id"), col("sig"),
      explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("_", b,
            md5(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ",")))))
        .as("band_key"))

    // bucket → sorted members → all i<j pairs within the bucket
    val buckets = banded.groupBy(col("band_key"))
      .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("members"))
      .filter(size(col("members")) > 1)

    val pairs = buckets.select(
        explode(flatten(transform(col("members"), (x, i) =>
          transform(
            slice(col("members"), i + lit(2), size(col("members"))),
            y => struct(
              x.getField("id").as("id_a"), y.getField("id").as("id_b"),
              x.getField("sig").as("sig_a"), y.getField("sig").as("sig_b"))))))
          .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sig_a"), col("p.sig_b"))
      .distinct()

    pairs
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(null)), v => v.isNotNull))
          .cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Per-doc SimHash sketch table (native one-pass kernel). */
  def simhashSketches(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(idCol.as("id"), simhash32Native(textCol).as("simhash"))

  /** SimHash sketch per doc + exact-sketch duplicate groups. */
  def simhashGroups(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    simhashSketches(df, textCol, idCol)
      .groupBy(col("simhash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"),
        count(lit(1)).as("n"))

  /** Exact n-gram Jaccard for given candidate pairs: a DataFrame with
    * (id_a, id_b) joined back to the texts. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("__id"),
      array_distinct(wordNgramsNative(col(textCol), n)).as("__grams"))
    pairs
      .join(grams.select(col("__id").as("id_a"), col("__grams").as("grams_a")), "id_a")
      .join(grams.select(col("__id").as("id_b"), col("__grams").as("grams_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
