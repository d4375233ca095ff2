package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.BpeTrainer

/** Pins the BPE encode/train contract (r15 verdict #5): applying the
  * learned merges as [[BpeTrainer.encodeSymbols]]'s literal-replace fold
  * must reproduce EXACTLY the final symbol state the train loop reached —
  * the property that makes a trained tokenizer reusable as a standalone
  * encode pass at 100 TB. Also exercises the periodic re-checkpoint path
  * (rounds > CheckpointEvery), which the 5-round gate never reaches. */
class BpeSpec extends SparkSpec {

  private def census(): DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(tokens(normalizeText(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  private def stateSet(df: DataFrame): Set[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  private def encodeEqualsTrain(rounds: Int): Unit = {
    val c = census()
    val pairs = BpeTrainer.merges(c, col("w"), col("n"), rounds)
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(pairs.nonEmpty)
    val encoded = c.select(
      BpeTrainer.encodeSymbols(col("w"), pairs).as("s"), col("n"))
    val trained = BpeTrainer.finalState(c, col("w"), col("n"), rounds)
      .select(col("s"), col("n"))
    assert(stateSet(encoded) == stateSet(trained),
      s"encode(merges) diverged from the train loop at rounds=$rounds")
  }

  test("encode(merges(census)) == training's final symbol state (gate " +
      "rounds)") {
    encodeEqualsTrain(5)
  }

  test("encode == train across the periodic re-checkpoint (rounds > " +
      "CheckpointEvery), and the merge list is prefix-stable") {
    encodeEqualsTrain(10)
    val c = census()
    val m5 = BpeTrainer.merges(c, col("w"), col("n"), 5)
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    val m10 = BpeTrainer.merges(c, col("w"), col("n"), 10)
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(m10.take(5) == m5, "longer training must extend, not rewrite, " +
      "the learned merge list")
  }

  test("q_bpe_merges32 (production depth): all 32 rounds complete, the " +
      "5-round gate is its prefix, and pair counts never increase") {
    val m32 = SparkEntry.queries("q_bpe_merges32")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(m32.length == 32, "the census must support 32 merges")
    val m5 = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
      .sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(m32.take(5).map(_.getString(1)).toSeq == m5,
      "deeper training must extend, not rewrite, the gate's merge list")
    val counts = m32.map(_.getAs[Long]("n_pair"))
    assert(counts.sliding(2).forall(p => p(1) <= p(0)),
      "a merged pair cannot out-count the pair it came from")
  }

  test("symbolTokens round-trips the encoding") {
    val c = census().limit(50)
    val back = c.select(col("w"),
        concat_ws("", BpeTrainer.symbolTokens(
          BpeTrainer.encodeSymbols(col("w"), Seq("a b", "c d")))).as("rt"))
      .filter(col("w") =!= col("rt"))
    assert(back.count() == 0, "token concat must reproduce the word")
  }
}
