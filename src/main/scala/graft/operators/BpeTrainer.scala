package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training, fixed merge rounds (SURVEY §2.19).
  *
  * The classical formulation (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") trains on the WORD
  * FREQUENCY DICTIONARY, not the corpus: the corpus is scanned exactly
  * once to build the word census; every merge round then runs over the
  * vocab-sized census (Heaps' law ≈ 10⁷ rows at 100 TB) with pair counts
  * weighted by word frequency. Each round is one explode + one weighted
  * aggregate + a 1-row argmax collect (a driver-side model artifact, the
  * [[KMeansLloyd]] centroid pattern) + one literal string replace — no
  * corpus pass, no growing driver state.
  *
  * Symbol encoding — the cross-engine contract with the unrolled DuckDB
  * oracle: a word's symbol sequence is rendered `|s1||s2||…||sk|` (every
  * symbol wrapped in `|`; words are whitespace-split so symbols can never
  * contain `|` or spaces). Merging pair (l, r) is then the LITERAL
  * replace of `|l||r|` with `|lr|`:
  *
  *  - boundary-safe: the pattern starts and ends at a symbol boundary,
  *    so `|a||b|` can never match inside `|xa||bc|`;
  *  - canonical greedy non-overlap: disjoint adjacent occurrences share
  *    no characters (`|a||b||a||b|` → `|ab||ab|`), and a same-symbol run
  *    merges leftmost-first (`|a||a||a|` → `|aa||a|`) — exactly BPE's
  *    left-to-right scan, and exactly what both engines' replace() does
  *    (scan, consume match, resume after it). A space-joined encoding
  *    (` l r ` → ` lr `) would share its boundary space between adjacent
  *    occurrences and silently skip every second merge.
  *
  * Ties on pair count break by pair string ascending (byte order — the
  * shared collation contract). All counts are exact longs.
  */
object BpeTrainer {

  /** Re-checkpoint the chained symbol frame every this many rounds:
    * round r's argmax job otherwise replays all r−1 literal replaces
    * from the census checkpoint — O(rounds²) recomputation and plan
    * growth if rounds is ever raised (r15 advisor). At the gate's
    * rounds = 5 the threshold never fires; the code path exists so a
    * larger-vocab training run stays O(rounds). */
  private val CheckpointEvery = 8

  private def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The shared train loop over a checkpointed symbol census: returns
    * the learned (round, pair, n_pair) list, the FINAL symbol state
    * (chained on `base`, re-checkpointed every [[CheckpointEvery]]
    * rounds with the superseded checkpoint released), and the LAST
    * periodic checkpoint if one was taken — the final state chains on
    * it, so a caller that discards the state must release it alongside
    * `base` (r16 advisor: merges() leaked it whenever
    * rounds ≥ CheckpointEvery). */
  private def trainLoop(base: DataFrame, rounds: Int)
      : (Seq[(Int, String, Long)], DataFrame, Option[DataFrame]) = {
    var sym: DataFrame = base
    var lastCkpt: DataFrame = base
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      val t = split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|")
      val best = sym
        .select(col("n"), explode(filter(
          zip_with(t, slice(t, lit(2), size(t)),
            (a, b) => concat(a, lit(" "), b)),
          p => p.isNotNull)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        learned += ((r, pair, cnt))
        val Array(l, rr) = pair.split(" ", 2)
        sym = sym.select(
          replace(col("s"), lit(s"|$l||$rr|"), lit(s"|$l$rr|")).as("s"),
          col("n"))
        if (r % CheckpointEvery == 0 && r < rounds) {
          val ckpt = sym.localCheckpoint()
          if (!(lastCkpt eq base)) release(lastCkpt)
          lastCkpt = ckpt
          sym = ckpt
        }
      }
    }
    (learned.toSeq, sym,
      if (lastCkpt eq base) None else Some(lastCkpt))
  }

  /** The `rounds` learned merges as (round, pair "l r", n_pair), in learn
    * order. `words` is the census: one row per distinct word with its
    * corpus frequency. Rounds where no pair exists (every word fully
    * merged) stop early. */
  def merges(words: DataFrame, wordCol: Column, countCol: Column,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "need rounds >= 1")
    val spark = words.sparkSession
    import spark.implicits._
    // checkpoint: the census is the ONE artifact every round re-reads;
    // without it each argmax job would replay the corpus tokenization
    val base = words
      .select(regexp_replace(wordCol, "(.)", "|$1|").as("s"),
        countCol.cast("long").as("n"))
      .filter(length(col("s")) > 0)
      .localCheckpoint()
    val (learned, _, lastCkpt) = trainLoop(base, rounds)
    // the result is a driver-side artifact (every round already
    // collected its 1-row argmax) — release the census checkpoint
    // blocks eagerly instead of waiting for driver GC (the KMeansLloyd
    // release discipline), and the last periodic re-checkpoint with it
    // (taken once rounds ≥ CheckpointEvery; the discarded final state
    // was the only thing chained on it)
    release(base)
    lastCkpt.foreach(release)
    learned.toDF("round", "pair", "n_pair")
      .orderBy(col("round"))
  }

  /** Training's final symbol state (s, n) — one row per census word with
    * its fully-merged `|s1||s2||…|` encoding. Spec surface (the
    * encode-≡-train consistency pin); the returned frame chains on a
    * LIVE census checkpoint the caller lets the driver GC reclaim. */
  def finalState(words: DataFrame, wordCol: Column, countCol: Column,
      rounds: Int): DataFrame = {
    val base = words
      .select(regexp_replace(wordCol, "(.)", "|$1|").as("s"),
        countCol.cast("long").as("n"))
      .filter(length(col("s")) > 0)
      .localCheckpoint()
    trainLoop(base, rounds)._2
  }

  /** ENCODE with trained merges: the boundary-safe literal-replace fold
    * applying `mergePairs` ("l r", in learn order) to a raw word column —
    * the production tokenize step a pipeline runs over the corpus once
    * training is done. Identical replace semantics to the train loop, so
    * encode(merges(census)) reproduces training's final symbol state
    * exactly (BpeSpec pins it). The merges ride into the plan as ≤rounds
    * string literals — broadcast-by-construction, no join. */
  def encodeSymbols(word: Column, mergePairs: Seq[String]): Column =
    mergePairs.foldLeft(regexp_replace(word, "(.)", "|$1|")) { (c, pair) =>
      val Array(l, r) = pair.split(" ", 2)
      replace(c, lit(s"|$l||$r|"), lit(s"|$l$r|"))
    }

  /** Split a `|s1||s2||…|` encoding into its token array. */
  def symbolTokens(enc: Column): Column =
    split(enc.substr(lit(2), length(enc) - 2), "\\|\\|")
}
