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
    * rounds ≥ CheckpointEvery).
    *
    * Round 18 (optimization): two structural changes, same learned
    * merges bit-for-bit.
    *  - The pending merges since the last checkpoint ride ONE
    *    higher-order `aggregate` fold over two literal arrays
    *    (pattern/replacement, applied in learn order — identical
    *    replace semantics to the old one-replace()-per-round literal
    *    chain) instead of a chain whose length grew each round. The
    *    per-round plan now has a CONSTANT shape — same analyzed tree
    *    size, same generated-code source (array literals travel as
    *    codegen references, not source text) — so the driver-side
    *    plan/compile cost per round stops growing with the round index.
    *  - The periodic re-checkpoint is LAZY: the next round's argmax job
    *    materializes it instead of a standalone job per checkpoint
    *    (guide §2.4, the Components/Skyline discipline); the superseded
    *    checkpoint is released only after its successor has
    *    materialized (a lazily-checkpointed RDD cannot be recomputed
    *    once its parent's blocks are dropped). */
  private def trainLoop(base: DataFrame, rounds: Int)
      : (Seq[(Int, String, Long)], DataFrame, Option[DataFrame]) = {
    var anchor: DataFrame = base
    var lastCkpt: DataFrame = base
    // merges applied since `anchor`, newest first: (pattern, replacement)
    var pending: List[(String, String)] = Nil
    var toRelease: Option[DataFrame] = None
    def sym: DataFrame =
      if (pending.isEmpty) anchor
      else {
        val ms = pending.reverse
        val pats = typedlit(ms.map(_._1))
        val reps = typedlit(ms.map(_._2))
        anchor.select(
          aggregate(sequence(lit(1), lit(ms.length)), col("s"),
            (acc, i) => replace(acc, element_at(pats, i),
              element_at(reps, i))).as("s"),
          col("n"))
      }
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
      // the argmax action above is the first read of any lazy checkpoint
      // taken last round — its blocks exist now, so the superseded
      // checkpoint can finally go
      toRelease.foreach(release)
      toRelease = None
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        learned += ((r, pair, cnt))
        val Array(l, rr) = pair.split(" ", 2)
        pending = (s"|$l||$rr|", s"|$l$rr|") :: pending
        if (r % CheckpointEvery == 0 && r < rounds) {
          val ckpt = sym.localCheckpoint(eager = false)
          if (!(lastCkpt eq base)) toRelease = Some(lastCkpt)
          lastCkpt = ckpt
          anchor = ckpt
          pending = Nil
        }
      }
    }
    toRelease.foreach(release)
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
    // without it each argmax job would replay the corpus tokenization.
    // LAZY (round 18): round 1's argmax materializes it — same single
    // corpus pass, one fewer standalone job.
    val base = words
      .select(regexp_replace(wordCol, "(.)", "|$1|").as("s"),
        countCol.cast("long").as("n"))
      .filter(length(col("s")) > 0)
      .localCheckpoint(eager = false)
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

  /** Train AND keep the final symbol state: the learned (round, pair,
    * n_pair) merges as a driver-side list (every round already collected
    * its 1-row argmax — the adjudicated bounded-model-artifact pattern)
    * plus the final (s, n) state frame. trainLoop's final state IS
    * encode(merges(census)) applied to every census word (identical
    * literal replaces in identical order — BpeSpec pins the
    * equivalence), so a train-then-apply gate can read the state instead
    * of re-running the encode fold over a SECOND corpus scan (round 18,
    * guide §1.2 "don't compute things you throw away": q_bpe_encode's
    * documents budget drops 2 scans → 1). The returned frame chains on
    * live census-checkpoint blocks that the caller lets the driver GC
    * reclaim after its one action (the [[finalState]] precedent). */
  def trainState(words: DataFrame, wordCol: Column, countCol: Column,
      rounds: Int): (Seq[(Int, String, Long)], DataFrame) = {
    require(rounds >= 1, "need rounds >= 1")
    val base = words
      .select(regexp_replace(wordCol, "(.)", "|$1|").as("s"),
        countCol.cast("long").as("n"))
      .filter(length(col("s")) > 0)
      .localCheckpoint(eager = false)
    val (learned, state, _) = trainLoop(base, rounds)
    (learned, state)
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
