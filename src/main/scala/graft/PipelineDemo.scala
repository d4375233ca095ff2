package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline demo over the test corpus:
  *
  *   documents → deterministic stratified sampling → benchmark
  *   decontamination → MinHash+LSH near-dup drop → quality length band →
  *   token-budget packing per language → JSONL shards partitioned by
  *   language (plus a run summary on stdout).
  *
  * Usage: `sbt "runMain graft.PipelineDemo [sfDir] [outDir]"`.
  * Every stage is the same operator the driver gate oracles individually
  * (`q_sample_stratified`, `q_decontaminate`, `q_dedup_minhash`,
  * `q_pack_budget`) — this main just composes them into the shape a real
  * corpus job ships with.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft-pipeline-out")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val docs = sources.Tables.load(spark, sfDir, "documents")

    // 1. reproducible mix: cap English, oversample zh, default 60%
    val sampled = operators.Sampling.stratifiedHashSample(
      docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "zh" -> 0.9), defaultRate = 0.6)

    // 2. decontaminate against the held-out eval slice
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val clean = operators.Contamination.scrub(
      sampled, eval, col("text"), col("doc_id"), n = 5)

    // 3. near-dup drop (LSH pairs → drop the higher id of each pair)
    val dups = operators.Dedup.minhashPairs(clean, col("text"), col("doc_id"),
        shingleSize = 3, k = 16, bands = 4, threshold = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = clean.join(dups, Seq("doc_id"), "left_anti")

    // 4. quality band + 5. per-language packs of ~20k chars
    val packed = operators.Packing.byBudget(
        deduped.filter(col("n_chars").between(50, 5000)),
        Seq(col("lang")), col("doc_id"), col("n_chars"), budget = 20000L)

    // 6. training shards: JSONL, ≤500 docs per shard, per-language dirs
    sinks.Sinks.writeJsonlShards(
      packed.select(col("doc_id"), col("lang"), col("pack_id"), col("text")),
      outDir, maxRecordsPerShard = 500L, partitionCols = Seq("lang"))

    val summary = spark.read.json(outDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(col("pack_id")).as("packs"))
      .orderBy(col("lang"))
      .collect()
      .map(r => s"${r.get(0)}: ${r.get(1)} docs in ${r.get(2)} packs")
    println(s"[pipeline] wrote $outDir — ${summary.mkString("; ")}")
    spark.stop()
  }
}
