package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) across two catalogs — the
  * dirty-data join a warehouse needs when keys don't line up: find
  * record pairs whose NAMES are within a small edit distance, WITHOUT
  * an all-pairs comparison.
  *
  * Standard two-stage shape (the ER analogue of the dedup family):
  *  1. **Multi-key blocking**: each record explodes to tagged blocking
  *     keys — its name's first 3 chars and last 3 chars. The join is an
  *     equi-join on the key. The pair generation guarantee is
  *     PIGEONHOLE-EXACT for names of length ≥ 7 at maxEdit = 1: a single
  *     edit cannot touch both the 3-char prefix and the 3-char suffix,
  *     so every true pair shares at least one key (spec-pinned, including
  *     the ≤ 6-char boundary where it fails). Shorter keys or more keys
  *     trade recall for candidate volume the usual way.
  *  2. **Verify**: exact `levenshtein` on the candidates only.
  *
  * Scale posture: one shuffle on short string keys; candidate volume is
  * Σ|block_l|·|block_r|, never |L|·|R|. Degenerate blocks (every product
  * named "the ...") are dropped WHOLE via a broadcast heavy-key census —
  * the same observable-drop discipline as [[Dedup.minhashPairs]]'s
  * bucket cap, applied to a two-sided join.
  */
object EntityResolution {

  /** Tagged prefix/suffix blocking keys ("p:abc", "s:cba" — the suffix
    * is taken through `reverse` so both engines read it identically). */
  def blockingKeys(name: Column): Column = array(
    concat(lit("p:"), substring(name, 1, 3)),
    concat(lit("s:"), substring(reverse(name), 1, 3)))

  /** Blocked fuzzy match of `left` names against `right` names.
    * Output: (id_a, id_b, dist), dist = levenshtein ≤ `maxEdit`, one row
    * per matched pair regardless of how many keys it shared.
    *
    * Two drop rules, both whole-key (census is ≤ distinct-key-count rows,
    * materialized once and broadcast to both anti-joins):
    *  - occupancy > `maxKey` on EITHER side (bounds shuffle skew);
    *  - left·right occupancy PRODUCT > `maxKeyPairs` (ADVICE r9: a key
    *    sitting just under `maxKey` on both sides still admits ~maxKey²
    *    verify pairs — 16.7M at the 4096 default — so the per-side cap
    *    alone bounds the blowup only quadratically; the product cap
    *    bounds the actual pair volume per key directly).
    * Pass `drops` to observe the dropped-key count in-flight (the
    * [[Dedup]] observable-drop discipline); it is available as soon as
    * this method returns, because the census is materialized here. */
  def blockedMatch(left: DataFrame, idL: Column, nameL: Column,
      right: DataFrame, idR: Column, nameR: Column,
      maxEdit: Int = 1, maxKey: Int = 4096,
      maxKeyPairs: Long = 1L << 22,
      drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxEdit >= 0, s"maxEdit must be >= 0, got $maxEdit")
    require(maxKey > 0, s"maxKey must be > 0, got $maxKey")
    require(maxKeyPairs > 0, s"maxKeyPairs must be > 0, got $maxKeyPairs")
    val l = left.select(idL.as("id_a"), nameL.as("name_a"),
      explode(blockingKeys(nameL)).as("__key"))
    val r = right.select(idR.as("id_b"), nameR.as("name_b"),
      explode(blockingKeys(nameR)).as("__key"))
    verifyPairs(cappedKeyJoin(l, r, maxKey, maxKeyPairs, drops), maxEdit)
  }

  /** Census-capped inner equi-join on `__key` — the shared blocking-join
    * core of [[blockedMatch]] and [[qgramMatch]]. Both drop rules (per-side
    * occupancy, left·right product) apply whole-key; the census is
    * materialized once and broadcast to both anti-joins; `drops` observes
    * the dropped-key count. */
  private def cappedKeyJoin(l: DataFrame, r: DataFrame, maxKey: Int,
      maxKeyPairs: Long,
      drops: Option[org.apache.spark.sql.Observation]): DataFrame = {
    val census = l.groupBy(col("__key")).agg(count(lit(1)).as("cl"))
      .join(r.groupBy(col("__key")).agg(count(lit(1)).as("cr")),
        Seq("__key"), "full_outer")
      .select(col("__key"),
        coalesce(col("cl"), lit(0L)).as("cl"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      // the occupancy product goes through DECIMAL(38,0): at a caller-
      // raised maxKey above ~3e9 a 64-bit cl*cr can overflow and wrap
      // negative, silently disabling the product rule for exactly the
      // keys it exists to catch (ADVICE r10)
      .filter(col("cl") > maxKey || col("cr") > maxKey ||
        col("cl").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("cr") > lit(maxKeyPairs))
      .select(col("__key"))
    // materialize ONCE (also fires the observation) so the two anti-joins
    // below reuse the small result instead of recomputing the census
    val heavy = drops.fold(census)(o =>
      census.observe(o, count(lit(1)).as("dropped_keys"))).localCheckpoint()
    l.join(broadcast(heavy), Seq("__key"), "left_anti")
      .join(r.join(broadcast(heavy), Seq("__key"), "left_anti"), "__key")
      .drop("__key")
  }

  /** Exact-verify stage shared by both blockers: dedup candidates (a pair
    * may share several keys; names are pair functions), then threshold
    * levenshtein — banded O(maxEdit·n) DP with early exit (−1 past the
    * bound) instead of the full O(n²) matrix. */
  private def verifyPairs(cands: DataFrame, maxEdit: Int): DataFrame =
    cands.distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxEdit))
      .filter(col("dist") >= 0 && col("dist") <= maxEdit)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))

  /** Positional-free q-gram array of a name (distinct grams; the whole
    * name when shorter than `q`). */
  private def qgrams(name: String, q: Int): Column =
    when(length(col(name)) < q, array(col(name)))
      .otherwise(array_distinct(expr(
        s"transform(sequence(0, length($name) - $q), i -> substring($name, i + 1, $q))")))

  /** Blocked fuzzy match honest at ANY `maxEdit` — the k-key
    * generalization of [[blockedMatch]] (which is pigeonhole-exact only
    * for maxEdit = 1 on names ≥ 7 chars). Ed-Join-style q-gram prefix
    * filtering:
    *
    *  - one edit destroys at most `q` distinct q-gram types, so
    *    ed(a, b) ≤ k ⇒ |grams(a) \ grams(b)| ≤ k·q;
    *  - under a SHARED global ordering of grams (document frequency
    *    ascending, then gram — rare grams first), that overlap bound
    *    forces the (k·q + 1)-prefixes of both gram lists to intersect
    *    (prefix-filtering principle, same machinery as the PPJoin text
    *    self-join);
    *  - so joining on the k·q + 1 RAREST grams of each name is a
    *    LOSSLESS candidate generator at edit distance k — declared
    *    semantics are simply "all pairs within `maxEdit`", with the
    *    census caps as the only (observable) recall cut.
    *
    * VALIDITY ENVELOPE: the theorem needs each name to HAVE q-grams, so
    * it holds for names of length ≥ `q`. A shorter name has zero
    * q-grams; it blocks on its whole text as a fallback key, which only
    * an identical short name shares — a sub-`q` name within `maxEdit`
    * of a LONGER name is missed (spec-pinned boundary, same posture as
    * [[blockedMatch]]'s ≤ 6-char pin). At q = 2 this affects only
    * 1-char names.
    *
    * Scale posture: gram df census is gram-type-bounded (≤ |charset|^q
    * rows) and broadcast; the per-name rank window partitions by name id
    * (never a global sort); the candidate join rides [[cappedKeyJoin]]
    * with both drop rules; a length-difference ≤ `maxEdit` filter prunes
    * before the levenshtein verify. */
  def qgramMatch(left: DataFrame, idL: Column, nameL: Column,
      right: DataFrame, idR: Column, nameR: Column,
      maxEdit: Int = 2, q: Int = 2, maxKey: Int = 4096,
      maxKeyPairs: Long = 1L << 22,
      drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxEdit >= 1, s"maxEdit must be >= 1, got $maxEdit")
    require(q >= 1, s"q must be >= 1, got $q")
    val keep = maxEdit * q + 1
    // two-step: the gram expr references the alias, which must resolve
    // against a child projection, not laterally within one select
    val lg = left.select(idL.as("id_a"), nameL.as("name_a"))
      .select(col("id_a"), col("name_a"), explode(qgrams("name_a", q)).as("g"))
    val rg = right.select(idR.as("id_b"), nameR.as("name_b"))
      .select(col("id_b"), col("name_b"), explode(qgrams("name_b", q)).as("g"))
    // SHARED order: df over both sides together, ties by gram — both
    // prefixes must be taken under the same total order for the
    // intersection guarantee to hold
    // materialized once: gram-type-bounded (≤ |charset|^q rows), and the
    // prefix pipeline below is evaluated several times (census + join)
    val dfOrder = lg.select(col("g")).unionAll(rg.select(col("g")))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    def prefix(ex: DataFrame, id: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(id)).orderBy(col("df"), col("g"))
      ex.join(broadcast(dfOrder), "g")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= keep)
        .drop("df", "__rk")
        .withColumnRenamed("g", "__key")
    }
    val cands = cappedKeyJoin(prefix(lg, "id_a"), prefix(rg, "id_b"),
        maxKey, maxKeyPairs, drops)
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxEdit)
    verifyPairs(cands, maxEdit)
  }
}
