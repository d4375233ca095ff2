package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.11): brute-force
  * cosine top-k as the exact baseline, and an IVF (inverted-file) variant as
  * the scale path.
  *
  * Cost model: brute force is |Q|×|C| dot products — correct when Q is a
  * handful of probes (broadcast Q, stream C; no shuffle of the corpus).
  * IVF cuts the scanned corpus to the `nprobe` nearest partitions per query:
  * corpus is assigned to centroids once (one narrow pass + small broadcast
  * join), queries only scan matching buckets. At 100 TB the bucket
  * assignment is the partitioning key — co-locate by `centroid_id` and the
  * probe join becomes partition-pruned.
  */
object Similarity {

  /** Cosine similarity of two ARRAY<FLOAT> columns, computed in double with
    * a deterministic left-to-right fold (portable across engines). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector. `queries` should be small
    * (it is broadcast); corpus streams through unshuffled until the final
    * per-query top-k (TakeOrdered-style via row_number). Self-matches are
    * excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Deterministic IVF index: centroids are the vectors whose id ≡ 0
    * (mod corpusSize/nlist) — a data-independent, reproducible coarse
    * quantizer (k-means would be the trained variant; the *structure* —
    * assign/probe/prune — is identical). Returns the corpus with a
    * `centroid_id` assignment column. */
  def ivfAssign(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = corpus.count()
    val stride = math.max(n / nlist, 1L)
    val centroids = corpus
      .filter(col(idCol) % stride === 0 && col(idCol) < stride * nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val w = Window.partitionBy(col(idCol)).orderBy(
      round(cosine(col(vecCol), col("centroid_vec")), 6).desc,
      col("centroid_id"))
    corpus.join(broadcast(centroids), lit(true))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .drop("__r", "centroid_vec")
  }

  /** IVF top-k: probe the `nprobe` nearest centroids per query, scan only
    * those buckets. Recall < 1.0 by design; the spec checks containment
    * against brute force on the high-score band. */
  def ivfTopK(queries: DataFrame, assigned: DataFrame,
      nprobe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = assigned
      .select(col("centroid_id")).distinct()
      .join(assigned.select(col(idCol).as("centroid_id"),
        col(vecCol).as("centroid_vec")), "centroid_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(
      round(cosine(col("qv"), col("centroid_vec")), 6).desc, col("centroid_id"))
    val probes = q.join(broadcast(centroids), lit(true))
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    probes.join(assigned.select(col("centroid_id"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among bucket-mates
    * (IVF buckets as the blocking key — same LSH-style pruning as MinHash
    * banding, but in embedding space). */
  def embeddingNearDupPairs(corpus: DataFrame, nlist: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, nlist, idCol, vecCol)
    val a = assigned.select(col("centroid_id"), col(idCol).as("id_a"),
      col(vecCol).as("va"))
    val b = assigned.select(col("centroid_id"), col(idCol).as("id_b"),
      col(vecCol).as("vb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("va"), col("vb")), 6))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
