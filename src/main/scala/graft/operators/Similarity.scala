package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * assignment is the partitioning key — co-locate by `centroid_id`
  * ([[ivfWritePartitioned]]) and the probe becomes a partition-pruned
  * scan ([[ivfTopKPruned]]; plan- and gate-asserted by LlmOpsSpec and
  * q_sim_ivf_pruned — not just a scaladoc claim).
  */
object Similarity {

  /** Cosine similarity of two ARRAY<FLOAT> columns, computed in double with
    * a deterministic left-to-right fold (portable across engines). Served by
    * the native fused kernel (plans/CosineSimExpr — the composed HOF fold is
    * CodegenFallback and allocates a zipped array per dot product);
    * bit-identical to [[cosineComposed]], asserted in VectorKernelsSpec. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.CosineSimExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The built-ins-only form of [[cosine]] — the executable spec the native
    * kernel is asserted against, and the source of the oracle SQL shape. */
  def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector. `queries` should be small
    * (it is broadcast); corpus streams through unshuffled and the per-query
    * top-k runs through the bounded-buffer aggregator — each map task
    * prunes to k candidates per query BEFORE the exchange, so the shuffle
    * carries ≤ k·|Q|·|tasks| entries instead of all |Q|·|C| scored rows
    * (the window form sorted the full scored set). Ordering contract is
    * identical (score desc, neighbor_id asc), so results are unchanged.
    * Self-matches are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
    TopK.perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("score"),
        col("rank"))
  }

  /** Deterministic IVF coarse quantizer: centroids are the vectors whose
    * id ≡ 0 (mod corpusSize/nlist) — data-independent and reproducible
    * (k-means would be the trained variant; the *structure* —
    * train/assign/probe/prune — is identical). The quantizer is a tiny
    * model artifact (nlist vectors), so like any real IVF it is collected
    * to the driver once and broadcast into the assignment pass. */
  def ivfTrain(corpus: DataFrame, nlist: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Long, Array[Float])] = {
    val n = corpus.count()
    val stride = math.max(n / nlist, 1L)
    val strided = corpus
      .filter(col(idCol) % stride === 0 && col(idCol) < stride * nlist)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // the stride pick assumes dense ids from 0; on sparse/offset id spaces
    // it can come up empty — fall back to the first nlist rows by id
    // (still deterministic, still data-independent)
    val picked =
      if (strided.nonEmpty) strided
      else corpus.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).cast("long"), col(vecCol))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    picked.sortBy(_._1).toSeq
  }

  /** Trained IVF coarse quantizer: spherical k-means (cosine assignment,
    * the same metric the probe uses) over a deterministic sample.
    *
    * Deterministic end to end — the sample is the `sampleSize` corpus rows
    * with the smallest portable 32-bit id-hash (spread, reproducible, no
    * RNG), init is an even stride over that hash-ordered sample, and Lloyd
    * iterations are driver-side float-free double arithmetic — so every
    * run (and both engines' fixtures) trains the identical model. Like any
    * real IVF quantizer the model is a tiny artifact (nlist × dim), which
    * is why collecting the sample to the driver is legitimate; the corpus
    * itself never moves. Centroid ids are 0..nlist−1. */
  def ivfTrainKMeans(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleSize: Int = 4096, iters: Int = 5): Seq[(Long, Array[Float])] = {
    import graft.functions.TextFunctions.hash32
    val sample = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy(hash32(col("id").cast("string")), col("id"))
      .limit(sampleSize)
      .collect()
      .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
    require(sample.nonEmpty, "ivfTrainKMeans: empty corpus")
    val dim = sample.head.length
    val k = math.min(nlist, sample.length)

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0 else dot / d
    }
    def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bestScore = Double.NegativeInfinity; var c = 0
      while (c < cs.length) {
        val s = cos(cs(c), v)
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      best
    }

    var centroids = Array.tabulate(k)(i => sample((i * sample.length) / k).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cluster keeps its centroid
        else sums(c).map(_ / counts(c)) // magnitude is irrelevant to cosine
      }
      it += 1
    }
    centroids.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }.toSeq
  }

  /** Top-`howMany` nearest centroid ids for a vector column, via the native
    * kernel (plans/NearestCentroidsExpr): one fused call per row, centroid
    * matrix passed as a codegen reference object — generated source stays
    * O(1) in nlist (inlining nlist literal vectors made Janino compilation
    * the dominant cost of the whole IVF query at bench scale). */
  private def nearestCentroids(vec: Column,
      centroids: Seq[(Long, Array[Float])], howMany: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.NearestCentroidsExpr(
      ColumnBridge.expression(vec), centroids.map(_._1),
      centroids.map(_._2.toSeq), howMany))
  }

  /** Corpus with a `centroid_id` assignment column. One narrow projection,
    * no join, no shuffle (the earlier cross-join + window form shuffled
    * |corpus|×nlist rows to rank them). Argmax by (round6(score) desc,
    * centroid_id asc), exactly the previous window ordering. */
  def ivfAssignWith(corpus: DataFrame, centroids: Seq[(Long, Array[Float])],
      vecCol: String = "embedding"): DataFrame = {
    // element_at on the empty nearest-array would be an ANSI error on the
    // first row — fail at plan time with an actionable message instead
    require(centroids.nonEmpty,
      "ivfAssignWith needs a non-empty quantizer (did ivfTrain see an empty corpus?)")
    corpus.withColumn("centroid_id",
      element_at(nearestCentroids(col(vecCol), centroids, 1), 1))
  }

  /** Train + assign in one call (the [[ivfTrain]] stride quantizer). */
  def ivfAssign(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfAssignWith(corpus, ivfTrain(corpus, nlist, idCol, vecCol), vecCol)

  /** IVF top-k: probe the `nprobe` nearest centroids per query, scan only
    * those buckets. Recall < 1.0 by design; the spec checks containment
    * against brute force on the high-score band.
    *
    * Centroid vectors are recovered from `assigned` as the distinct
    * centroid ids joined back to their corpus vectors (see the inline note
    * on why self-assignment recovery is wrong). The probe set (|Q|·nprobe
    * rows) is broadcast at the bucket join, so the corpus never shuffles;
    * at scale, partitioning `assigned` by `centroid_id` turns that join
    * into a partition-pruned scan of nprobe/nlist of the data. */
  def ivfTopK(queries: DataFrame, assigned: DataFrame,
      nprobe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // recover the quantizer: the distinct centroid ids, joined back to
    // their corpus vectors. (NOT the self-assignment shortcut
    // `idCol === centroid_id` — two near-parallel centroids can round-tie,
    // assigning one to the other; its bucket would then silently vanish
    // from every probe.)
    val ids = assigned.select(col("centroid_id").cast("long")).distinct()
      .collect().map(_.getLong(0))
    val centroids = assigned
      .filter(col(idCol).isin(ids.map(java.lang.Long.valueOf).toSeq: _*))
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    ivfTopKWith(queries, assigned, centroids, nprobe, k, idCol, vecCol)
  }

  /** IVF top-k against an explicit quantizer: per-query probe selection is
    * one narrow projection (score the nlist literal centroids, sort the
    * struct array, slice nprobe, explode) — no centroid join, no window.
    * The only wide operations are the broadcast of the |Q|·nprobe probe set
    * into the bucket join and the final per-query top-k, which runs through
    * the bounded-buffer aggregator exactly like [[bruteForceTopK]] /
    * [[quantizedTopK]]: each map task prunes to k candidates per query
    * BEFORE the exchange (the earlier window form shuffled and sorted every
    * scored (bucket × probe) row). Ordering contract is unchanged
    * (score desc, neighbor_id asc); a corpus row lives in exactly one
    * bucket, so no (query, neighbor) pair is scored twice. */
  def ivfTopKWith(queries: DataFrame, assigned: DataFrame,
      centroids: Seq[(Long, Array[Float])], nprobe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("centroid_id",
        explode(nearestCentroids(col("qv"), centroids, nprobe)))
    val scored = assigned.select(col("centroid_id"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
    TopK.perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("score"),
        col("rank"))
  }

  /** The 100 TB IVF layout: the assigned corpus written with one
    * directory per coarse cell (`centroid_id=<cid>/part-*.parquet`).
    * Co-locating by cell is what turns the probe join into a
    * partition-pruned scan — see [[ivfTopKPruned]], which reads back
    * exactly nprobe-ish of nlist directories. */
  def ivfWritePartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(path)

  /** The distinct coarse cells the probe set touches: ≤ |Q|·nprobe ids —
    * a bounded model-artifact-sized list (the same collect posture as the
    * quantizer itself), NOT a data-plane collect. Public so the pruning
    * spec can assert the scanned directory set equals this list. */
  def ivfProbeCells(queries: DataFrame,
      centroids: Seq[(Long, Array[Float])], nprobe: Int,
      vecCol: String = "embedding"): Array[Long] =
    queries
      .select(explode(nearestCentroids(col(vecCol), centroids, nprobe))
        .as("centroid_id"))
      .distinct().collect().map(_.getLong(0)).sorted

  /** [[ivfTopKWith]] over a centroid-partitioned corpus read
    * ([[ivfWritePartitioned]] layout): the probe cells are pushed into
    * the scan as a STATIC partition filter, so the parquet source lists
    * and reads only the probed directories — `PartitionFilters:
    * [centroid_id IN (...)]` in the plan, nprobe/nlist of the data off
    * disk instead of a full scan with a post-hoc join. Results are
    * identical to the unpartitioned path (same probe set, same buckets,
    * same ordering contract) — gate-pinned by q_sim_ivf_pruned.
    *
    * The filter references ONLY the partition column, so pruning happens
    * at file listing (Catalyst evaluates it against the partition values
    * — a cast inserted by the int-inferred partition column is fine);
    * the broadcast probe join then runs over the already-pruned scan. */
  def ivfTopKPruned(queries: DataFrame, assignedPartitioned: DataFrame,
      centroids: Seq[(Long, Array[Float])], nprobe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = ivfProbeCells(queries, centroids, nprobe, vecCol)
    val pruned = assignedPartitioned
      .filter(col("centroid_id").isin(cells.map(java.lang.Long.valueOf).toSeq: _*))
      // the read-back partition column type is inference-dependent
      // (int for small cell ids) — normalize AFTER the pruning filter
      .withColumn("centroid_id", col("centroid_id").cast("long"))
    ivfTopKWith(queries, pruned, centroids, nprobe, k, idCol, vecCol)
  }

  // -- int8 quantization (embedding storage compression) ---------------------
  // Symmetric per-vector quantization: scale = max|x|/127, q = round(x/scale)
  // as tinyint — 4× smaller vectors for ANN shortlists, with dequantized
  // rescoring on the shortlist only. All-zero vectors quantize to zeros
  // (scale 0 guard) instead of erroring the pass.

  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127d

  def int8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0d, lit(0d))
        .otherwise(round(x.cast("double") / scale, 0)).cast("byte"))

  def int8Dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Two-stage ANN over int8-quantized storage — the operator the int8
    * family exists for: stage 1 ranks every corpus vector by cosine
    * against its DEQUANTIZED int8 form (the 4× smaller representation
    * that is all a 100 TB corpus keeps hot), pruning map-side to a
    * per-query `shortlist` via the bounded-buffer aggregator; stage 2
    * joins ONLY the shortlist back to the full-precision vectors and
    * rescores exactly. `score` in the output is the exact rescored
    * cosine; recall vs full-precision brute force is governed by
    * `shortlist` (spec-asserted: equals brute force when the shortlist
    * covers the corpus). */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val qz = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        int8Scale(col(vecCol)).as("__s"))
      .select(col("neighbor_id"),
        int8Dequantize(int8Quantize(col("cv"), col("__s")), col("__s"))
          .as("dq"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val approx = qz.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_score", round(cosine(col("qv"), col("dq")), 6))
    val short = TopK.perGroup(approx, Seq("query_id"),
        col("approx_score"), col("neighbor_id"), shortlist)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val exact = short
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
    TopK.perGroup(exact, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("score"),
        col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among bucket-mates
    * (IVF buckets as the blocking key — same LSH-style pruning as MinHash
    * banding, but in embedding space).
    *
    * Skew safety: a hot bucket (one centroid attracting a boilerplate
    * cluster) makes the self-join emit |bucket|² rows from one task, so
    * buckets above `maxBucket` are excluded whole. The census is a LAZY
    * per-centroid aggregate (≤ nlist rows) broadcast-joined back — no
    * driver action at construction time; pass `drops` to observe the
    * dropped-bucket count in-flight, mirroring
    * [[graft.operators.Dedup.minhashPairs]]. The assignment pass is
    * shuffle-materialized on `centroid_id` so the census and both
    * self-join sides reuse ONE exchange instead of recomputing the
    * centroid scoring three times.
    *
    * The quantizer defaults to the TRAINED sampled k-means
    * ([[ivfTrainKMeans]]), not the strided pick: bucket balance directly
    * bounds the |bucket|² self-join cost, and a data-blind quantizer can
    * collapse most of a clustered corpus into one hot bucket (spec-asserted:
    * the planted-skew case shows a strictly smaller max bucket census under
    * the trained model). Pass `ivfTrain(_, _, _, _)` to get the old
    * data-independent behavior. */
  def embeddingNearDupPairs(corpus: DataFrame, nlist: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 10000,
      drops: Option[org.apache.spark.sql.Observation] = None,
      quantizer: (DataFrame, Int, String, String) => Seq[(Long, Array[Float])] =
        ivfTrainKMeans(_, _, _, _)): DataFrame = {
    val assigned =
      ivfAssignWith(corpus, quantizer(corpus, nlist, idCol, vecCol), vecCol)
      .repartition(col("centroid_id"))
    val census = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("__bn"))
    val observed = drops.fold(census)(o => census.observe(o,
      sum(when(col("__bn") > maxBucket, 1L).otherwise(0L))
        .as("dropped_buckets")))
    val kept = assigned
      .join(broadcast(observed.filter(col("__bn") <= maxBucket)),
        Seq("centroid_id"))
      .drop("__bn")
    val a = kept.select(col("centroid_id"), col(idCol).as("id_a"),
      col(vecCol).as("va"))
    val b = kept.select(col("centroid_id"), col(idCol).as("id_b"),
      col(vecCol).as("vb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("va"), col("vb")), 6))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
