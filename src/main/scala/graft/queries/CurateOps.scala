package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions._
import graft.operators.{Sessionize, Similarity, TopK}
import graft.sources.Tables

/** Corpus-curation operators round 3 (SURVEY §2.11 extensions): batch
  * sessionization, per-source document caps, token-rarity scoring,
  * reciprocal-rank fusion of hybrid retrieval, deterministic random
  * projection of embeddings, equi-width histogram profiling, and
  * leak-free group-aware splits. Every query carries a full DuckDB oracle.
  */
object CurateOps extends QueryPack {

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  private def events(s: SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  private def emb(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  /** Plan-time sign matrix for [[graft.operators.Similarity]]-style random
    * projection: sign(j, i) = ±1 from the SAME portable md5-derived hash as
    * [[hash32]] over the flattened index (j·4096 + i, i 1-based to match
    * the oracle's `generate_series(1, len)`), so the projection matrix is
    * a pure function of indices — reproducible across engines, sessions
    * and partitionings with no stored model artifact. */
  private[graft] def projSign(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(String.valueOf(j * 4096 + i).getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  private val ProjDims = 4
  private val EmbDims = 64

  /** 12-hour inactivity gap in microseconds. */
  private val GapUs = 12L * 3600 * 1000000

  private val SourceCap = 15

  // RRF with integer arithmetic: score = Σ floor(10^9 / (60 + rank)).
  // The usual 1/(60+r) doubles are engine-stable here, but the integer
  // form is exact by construction and survives any future k change.
  private val RrfK = 60

  override def defs: Map[String, Q] = Map(
    // Batch sessionization of the event log: 12h-gap sessions per user,
    // then per-session rollup. One exchange on user_id feeds both windows;
    // the rollup keys on the (user, session) composite.
    "q_sessionize" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        col("value"), unix_micros(col("ts")).as("us"))
      Sessionize.byGap(e, col("user_id"), col("us"), col("event_id"), GapUs)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          Parity.dsum(col("value")).as("sum_value"),
          expr("(max(us) - min(us)) div 1000000").as("duration_s"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // Per-source document cap (RefinedWeb/Gopher-style domain balancing):
    // keep at most `SourceCap` docs per source, ranked by a portable hash
    // of the id — deterministic in the data, uniform over the source. The
    // kept set flows through the bounded TopK aggregator (map-side prune:
    // the shuffle carries ≤ k·|sources|·|tasks| entries, never the corpus),
    // and kept_id_sum pins the exact membership, not just the count.
    "q_source_cap" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = TopK.perGroup(
        d.withColumn("h", hash32(col("doc_id").cast("string"))),
        Seq("source"), -col("h"), col("doc_id"), SourceCap)
      val keptAgg = kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("id")).as("kept_id_sum"))
      d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(keptAgg, Seq("source"))
        .orderBy(col("source"))
    }),

    // Token-rarity scoring — the perplexity-proxy LM filter with the
    // arithmetic kept exact: a doc's mean corpus-frequency of its tokens,
    // and the fraction of its tokens rarer than the corpus mean. Thresholds
    // derive FROM the data (no magic constant to re-tune per scale). Sums
    // are integer products; only the final ratios go through doubles.
    "q_token_rarity" -> ((s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"),
          explode(tokens(normalizeText(col("text")))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val freq = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
      val thr = freq.agg(expr("sum(c) div count(1)").as("mean_c"))
      tf.join(freq, Seq("token"))
        .crossJoin(broadcast(thr))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          round(sum(col("tf") * col("c")).cast("double") /
            sum(col("tf")).cast("double"), 6).as("mean_tok_freq"),
          round(sum(when(col("c") < col("mean_c"), col("tf")).otherwise(0L))
            .cast("double") / sum(col("tf")).cast("double"), 6)
            .as("rare_frac"))
        .orderBy(col("doc_id"))
    }),

    // Hybrid-retrieval fusion: dense ranking (cosine to a probe embedding)
    // and lexical ranking (distinct-token overlap with the probe doc),
    // fused by reciprocal rank. Each ranker's top-20 comes from
    // TakeOrderedAndProject (never a global window over the corpus); the
    // rank assignment windows run AFTER the limit, over 20 rows, partition
    // keyed by a literal so no partition-less-window warning fires.
    "q_rrf_fusion" -> ((s, dir) => {
      val e = emb(s, dir)
      val probeV = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("pv"))
      val dense = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probeV))
        .select(col("vec_id").as("id"),
          round(Similarity.cosine(col("embedding"), col("pv")), 6)
            .as("score"))
        .orderBy(col("score").desc, col("id")).limit(20)
      val dr = dense.withColumn("rank_dense",
        row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("score").desc, col("id"))).cast("long"))
      val probeToks = docs(s, dir).filter(col("doc_id") === 0)
        .select(explode(tokens(normalizeText(col("text")))).as("token"))
        .distinct()
      val lex = docs(s, dir).filter(col("doc_id") =!= 0)
        .select(col("doc_id").as("id"),
          explode(tokens(normalizeText(col("text")))).as("token"))
        .join(broadcast(probeToks), Seq("token"))
        .groupBy(col("id"))
        .agg(countDistinct(col("token")).as("overlap"))
        .orderBy(col("overlap").desc, col("id")).limit(20)
      val lr = lex.withColumn("rank_lex",
        row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("overlap").desc, col("id"))).cast("long"))
      dr.select(col("id"), col("rank_dense"))
        .join(lr.select(col("id"), col("rank_lex")), Seq("id"), "full_outer")
        .select(col("id"),
          (coalesce(expr(s"1000000000 div ($RrfK + rank_dense)"), lit(0L)) +
            coalesce(expr(s"1000000000 div ($RrfK + rank_lex)"), lit(0L)))
            .as("rrf_nano"),
          col("rank_dense"), col("rank_lex"))
        .orderBy(col("rrf_nano").desc, col("id")).limit(10)
    }),

    // Deterministic Johnson-Lindenstrauss sign projection 64 → 4 dims: the
    // sign matrix is a plan-time literal derived from the portable hash
    // (no model artifact, no shuffle — the whole operator is a narrow
    // codegen'd projection at scan speed). Folds run in index order, so
    // the double sums are bit-identical cross-engine (the cosine-parity
    // discipline of SimOps).
    "q_embed_project" -> ((s, dir) => {
      val cols = (0 until ProjDims).map { j =>
        val signs = typedlit((1 to EmbDims).map(i => projSign(j, i)))
        round(aggregate(
          zip_with(col("embedding"), signs, (v, sg) => v.cast("double") * sg),
          lit(0.0), (acc, v) => acc + v), 6).as(s"p$j")
      }
      emb(s, dir).select(col("vec_id") +: cols: _*).orderBy(col("vec_id"))
    }),

    // Equi-width histogram of document length per language — the profiling
    // pass that sizes chunking/packing budgets. Bucket arithmetic is pure
    // integer (floor-div, clamp to the last bucket); one narrow projection
    // plus one low-cardinality aggregate.
    "q_histogram" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"),
          least(expr("n_chars div 128"), lit(15L)).as("bucket"),
          col("n_chars"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
        .orderBy(col("lang"), col("bucket"))),

    // Collocation mining: adjacent-bigram PMI against independence, the
    // phrase-detection pass (word2vec-style "new_york" merging). The PMI
    // ratio is held in integer micro-units — float log-PMI would not
    // cross engines bit-for-bit; the ranking is the same either way.
    // Bigrams come from the narrow n-gram slices (no positional
    // self-join); unigram counts join on the token key; the final top-20
    // is a TakeOrderedAndProject.
    "q_collocations" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = d.select(explode(tokens(normalizeText(col("text"))))
        .as("token"))
      // round 18: tokenize for unigrams ONCE — the census feeds both
      // PMI join sides and the total (ScanCount measured the documents
      // scan executing 4× at sf0.01: AQE re-planning defeats exchange
      // reuse across the consumers); the total is Σ c over the census
      // (≡ the token count — the census partitions every token).
      // 4 scans → 2 (the bigram pass is the other, a different explode).
      val uni = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = false)
      val tot = uni.agg(sum(col("c")).as("n"))
      val bg = d.select(explode(tokenBigrams(col("text"))).as("pq"))
        .select(col("pq.t1").as("t1"), col("pq.t2").as("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c2"))
        .filter(col("c2") >= 5)
      bg.join(uni.select(col("token").as("t1"), col("c").as("ca")), Seq("t1"))
        .join(uni.select(col("token").as("t2"), col("c").as("cb")), Seq("t2"))
        .crossJoin(broadcast(tot))
        .select(col("t1"), col("t2"), col("c2"),
          expr("(c2 * n * 1000000) div (ca * cb)").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("t1"), col("t2"))
        .limit(20)
    }),

    // Fingerprint key-collision clustering (round 10): the OpenRefine
    // "cluster & edit" move — names that normalize to the same
    // SORTED-TOKEN fingerprint (case/whitespace/word-order insensitive)
    // are spelling variants of one entity. TPC-H part names never
    // collide naturally, so every 7th part plants an UPPERCASED,
    // word-REVERSED variant (the two transforms the fingerprint is
    // supposed to erase; the shared variant-offset guard keeps the id
    // injective). One narrow fingerprint projection + one group; only
    // colliding groups (≥ 2 distinct raw spellings) surface, with the
    // lexicographically smallest spelling as the canonical suggestion.
    "q_key_collision" -> ((s, dir) => {
      val base = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val variants = base.filter(col("p_partkey") % 7 === 0)
        .select((Parity.guardedVariantId(col("p_partkey"))
            + Parity.VariantOffset).as("p_partkey"),
          upper(array_join(reverse(tokens(col("p_name"))), " "))
            .as("p_name"))
      val parts = base.unionByName(variants)
      val fp = parts.select(col("p_partkey"), col("p_name"),
        array_join(array_sort(array_distinct(
          tokens(normalizeText(col("p_name"))))), " ").as("fp"))
      fp.groupBy(col("fp"))
        .agg(countDistinct(col("p_name")).as("n_spellings"),
          count(lit(1)).as("n_rows"),
          min(col("p_name")).as("canonical"))
        .filter(col("n_spellings") >= 2)
        .orderBy(col("fp"))
    }),

    // Daily quantile bands (round 10): exact p10/p50/p90 of event values
    // per day — the percentile ribbon behind every latency/revenue
    // dashboard, through the distributed rank frame (group = day; never
    // a per-day single-partition window). Values are compared in exact
    // micro-units to keep the DISC picks bit-portable.
    "q_daily_bands" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(expr("unix_micros(ts) div 86400000000").as("d"),
          (col("value").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("v"))
      graft.operators.Percentiles.exactDisc(e, col("d"), col("v"),
          Seq((1, 10), (1, 2), (9, 10)), Seq("p10", "p50", "p90"))
        .select(col("group").as("d"), col("p10"), col("p50"), col("p90"))
        .orderBy(col("d"))
    }),

    // Skip-gram PMI (round 10): collocation mining with a window — token
    // pairs co-occurring within 3 positions (not just adjacent), the
    // co-occurrence statistic word-vector training actually uses. The
    // positional pair join is doc-keyed and the window bounds fan-out at
    // 3 rows per token; PMI in exact micro-units with 128-bit staging
    // (c2·n·10⁶ passes 2⁶³ once corpora reach ~10⁷ tokens).
    "q_skipgram_pmi" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"),
        posexplode(tokens(normalizeText(col("text"))))
          .as(Seq("pos", "token")))
      val uni = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val tot = tok.agg(count(lit(1)).as("n"))
      val pairs = tok.as("a").join(tok.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.pos") > col("a.pos") &&
            col("b.pos") <= col("a.pos") + 3)
        .groupBy(col("a.token").as("t1"), col("b.token").as("t2"))
        .agg(count(lit(1)).as("c2"))
        .filter(col("c2") >= 5)
      pairs
        .join(uni.select(col("token").as("t1"), col("c").as("ca")), Seq("t1"))
        .join(uni.select(col("token").as("t2"), col("c").as("cb")), Seq("t2"))
        .crossJoin(broadcast(tot))
        .select(col("t1"), col("t2"), col("c2"),
          expr("""CAST((CAST(c2 AS DECIMAL(38,0)) * n * 1000000) div
                 (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)""")
            .as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("t1"), col("t2"))
        .limit(20)
    }),

    // Balanced interleave sample (round 10): the "fair head" eval-set
    // draw — rank docs WITHIN each language (distributed rank frame),
    // take the per-language head, and interleave round-robin (rank, then
    // language) so no language dominates any prefix of the sample. Plans
    // as TakeOrderedAndProject over the rank-frame output.
    "q_interleave_sample" -> ((s, dir) => {
      graft.operators.Percentiles.globalRanksTieBroken(
          docs(s, dir), col("lang"), col("doc_id"), col("doc_id"))
        .select(col("group").as("lang"), col("tie").as("doc_id"),
          col("rank").cast("long").as("rank"))
        .filter(col("rank") <= 20)
        .orderBy(col("rank"), col("lang"))
        .limit(50)
    }),

    // Vocabulary growth / Heaps-law curve (round 10): distinct vocabulary
    // size after the first N documents, at 5 prefix checkpoints — the
    // corpus statistic that says whether more data still buys new
    // vocabulary. Per-doc DISTINCT tokens explode once; the 5-row
    // checkpoint dim broadcast-joins on doc_id < cp (≤ 5× fan-out);
    // one multi-distinct aggregate per checkpoint.
    "q_vocab_growth" -> ((s, dir) => {
      import s.implicits._
      val cps = Seq(100L, 200L, 300L, 400L, 500L).toDF("cp")
      val tok = docs(s, dir).select(col("doc_id"),
        explode(array_distinct(tokens(normalizeText(col("text")))))
          .as("token"))
      tok.join(broadcast(cps), col("doc_id") < col("cp"))
        .groupBy(col("cp"))
        .agg(countDistinct(col("token")).as("vocab"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("cp"))
    }),

    // Bigram language model as next-token predictor: train the argmax
    // table (most frequent next token per prefix, per language) and score
    // it against the corpus it was trained on — the classic LM-quality
    // probe with the whole computation in counts, no log-probs, so both
    // engines agree exactly. The argmax is one aggregation — min over
    // (−count, token) structs — not a window; the prediction table is
    // vocab-sized and the final join groups straight back down to one row
    // per language.
    "q_lm_next_token" -> ((s, dir) => {
      val bg = docs(s, dir)
        .select(col("lang"), explode(tokenBigrams(col("text"))).as("pq"))
        .select(col("lang"), col("pq.t1").as("t1"), col("pq.t2").as("t2"))
        .groupBy(col("lang"), col("t1"), col("t2"))
        .agg(count(lit(1)).as("c2"))
      val pred = bg.groupBy(col("lang"), col("t1"))
        .agg(min(struct((-col("c2")).as("negc"), col("t2"))).as("m"))
        .select(col("lang"), col("t1"), col("m.t2").as("p"))
      bg.join(pred, Seq("lang", "t1"))
        .groupBy(col("lang"))
        .agg(sum(col("c2")).as("total_bigrams"),
          sum(when(col("t2") === col("p"), col("c2")).otherwise(0L))
            .as("correct"))
        .select(col("lang"), col("total_bigrams"), col("correct"),
          expr("(1000 * correct) div total_bigrams").as("acc_milli"))
        .orderBy(col("lang"))
    }),

    // Edit-distance near-dup verification: blocking (language, coarse
    // length bucket, 12-char normalized prefix) generates candidates as an
    // EQUI-join — never all-pairs — and Levenshtein verifies each pair on
    // a bounded 200-char prefix, so per-pair cost is capped. Non-ASCII
    // chars are projected to '?' (one char each) before the distance:
    // Spark's levenshtein counts CHARACTERS while DuckDB's counts BYTES,
    // and the ASCII projection makes the two metrics coincide without
    // losing the char-level distance structure of any script.
    "q_dedup_edit" -> ((s, dir) => {
      val n = docs(s, dir).select(
        col("doc_id"), col("lang"),
        expr("n_chars div 20").as("lb"),
        substring(normalizeText(col("text")), 1, 12).as("blk"),
        regexp_replace(substring(normalizeText(col("text")), 1, 200),
          "[^\\x20-\\x7e]", "?").as("p"))
      val a = n.select(col("doc_id").as("id1"), col("lang"), col("lb"),
        col("blk"), col("p").as("p1"))
      val b = n.select(col("doc_id").as("id2"), col("lang"), col("lb"),
        col("blk"), col("p").as("p2"))
      a.join(b, Seq("lang", "lb", "blk"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          levenshtein(col("p1"), col("p2")).cast("long").as("dist"))
        .filter(col("dist") <= 20)
        .orderBy(col("id1"), col("id2"))
    }),

    // Entity resolution across two catalogs (round 9): the part catalog
    // vs a dirty feed (each name's 4th char overwritten — a typo that by
    // the pigeonhole guarantee never touches BOTH the 3-char prefix and
    // the 3-char suffix, so multi-key blocking catches every pair).
    // Blocking semantics are part of the declared contract — the oracle
    // replays the same (prefix OR suffix) candidate rule plus the exact
    // levenshtein verify, so the gate pins both stages.
    "q_entity_match" -> ((s, dir) => {
      val base = Tables.load(s, dir, "part")
        .filter(col("p_partkey") < 1000)
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val dirty = base.select((col("id") + Parity.VariantOffset).as("id"),
        concat(substring(col("name"), 1, 3), lit("x"),
          col("name").substr(lit(5), length(col("name")))).as("name"))
      graft.operators.EntityResolution.blockedMatch(
          base, col("id"), col("name"), dirty, col("id"), col("name"),
          maxEdit = 1, maxKey = 4096)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Entity resolution at maxEdit = 2 (round 10): the k-key-honest
    // blocker — Ed-Join q-gram prefix filtering (k·q + 1 rarest bigrams
    // per name under a shared df-ascending order) is LOSSLESS at edit
    // distance 2, where the prefix/suffix pigeonhole of q_entity_match
    // would silently lose recall. The dirty feed applies TWO edits per
    // name (4th char overwritten + 12th char deleted — substitution AND
    // deletion, the shift case positional blocking can't see), so the
    // oracle is the plain all-pairs levenshtein ≤ 2 join: blocking is
    // not part of the declared semantics here, exactly because it is
    // recall-exact.
    "q_entity_match2" -> ((s, dir) => {
      val base = Tables.load(s, dir, "part")
        .filter(col("p_partkey") < 1000)
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val dirty = base.select((col("id") + Parity.VariantOffset).as("id"),
        concat(substring(col("name"), 1, 3), lit("x"),
          col("name").substr(lit(5), lit(7)),
          col("name").substr(lit(13), length(col("name")))).as("name"))
      graft.operators.EntityResolution.qgramMatch(
          base, col("id"), col("name"), dirty, col("id"), col("name"),
          maxEdit = 2, q = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Training-data release capstone (round 10): the end-of-pipeline
    // composition a data release runs — quality gate (the scale-invariant
    // length band; a corpus-frequency gate like LM coverage saturates as
    // data grows) → per-language class-balance weights over the
    // SURVIVORS → deterministic negative-pair generation over the
    // survivor rank frame (the q_negative_sample arithmetic) → one
    // per-language release manifest. Every stage is individually oracled
    // elsewhere; this pins the composition.
    "q_release_pipeline" -> ((s, dir) => {
      val pass = docs(s, dir)
        .filter(col("n_chars").between(100, 2000))
        .select(col("doc_id"), col("lang"))
      val ranks = graft.operators.Percentiles.globalRanksTieBroken(
          pass, lit(0), col("doc_id"), col("doc_id"))
        .select(col("tie").as("doc_id"), col("rank"), col("n"))
      val negs = ranks
        .select(col("doc_id"), col("rank"), col("n"),
          explode(sequence(lit(1), lit(2))).as("k"))
        .withColumn("neg_rank",
          expr("((rank - 1) * 2654435761 + k * 40503) % n + 1"))
        .filter(col("neg_rank") =!= col("rank"))
      val perLang = pass.groupBy(col("lang")).agg(count(lit(1)).as("n_pass"))
      val tot = perLang.agg(sum(col("n_pass")).as("total"),
        count(lit(1)).as("k"))
      val negPerLang = negs
        .join(pass, Seq("doc_id"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_neg"))
      docs(s, dir).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .join(perLang, Seq("lang"), "left")
        .join(negPerLang, Seq("lang"), "left")
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          coalesce(col("n_pass"), lit(0L)).as("n_pass"),
          coalesce(col("n_neg"), lit(0L)).as("n_neg"),
          expr("(total * 1000000) div (k * n_pass)").as("weight_micro"))
        .orderBy(col("lang"))
    }),

    // Class-balanced resampling weights (round 10): the standard
    // inverse-frequency weight total/(k·n_class) per class in exact
    // micro-units — what a loss function or sampler multiplies in to
    // undo class imbalance. One group count + a broadcast 1-row total.
    "q_class_weights" -> ((s, dir) => {
      val counts = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(col("n_docs")).as("total"),
        count(lit(1)).as("k"))
      counts.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          expr("(total * 1000000) div (k * n_docs)").as("weight_micro"))
        .orderBy(col("lang"))
    }),

    // Group-median imputation (round 10): the ML-prep null fill — missing
    // n_chars (synthesized deterministically: every 13th doc) takes its
    // language's exact discrete median of the NON-null values. Median via
    // the distributed rank frame (Percentiles.exactDisc — bit-portable
    // actual data values), imputed thresholds broadcast back; was_imputed
    // keeps the fill auditable (the imputation-mask column every serious
    // feature pipeline carries).
    "q_impute_median" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        when(col("doc_id") % 13 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars")).as("nc"))
      val med = graft.operators.Percentiles.exactDisc(
          d.filter(col("nc").isNotNull), col("lang"), col("nc"),
          Seq((1, 2)), Seq("med"))
        .select(col("group").as("lang"), col("med"))
      d.join(broadcast(med), Seq("lang"))
        .select(col("doc_id"),
          coalesce(col("nc"), col("med")).cast("long")
            .as("n_chars_imputed"),
          col("nc").isNull.as("was_imputed"))
        .orderBy(col("doc_id"))
    }),

    // Crawl-delta snapshot diff: the incremental-ingest primitive — what
    // changed between yesterday's corpus and today's, by id and content
    // hash. One full-outer co-partitioned join on the id; text never
    // leaves its side (only the 16-byte md5 crosses for the compare).
    // The "new" snapshot is derived deterministically (drops, edits,
    // additions) so the oracle can pin every status bucket exactly.
    "q_corpus_diff" -> ((s, dir) => {
      val old = docs(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
      val nw = docs(s, dir).filter(col("doc_id") % 17 =!= 3)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 23 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h"))
        .unionAll(docs(s, dir).filter(col("doc_id") % 11 === 5)
          .select((col("doc_id") + Parity.VariantOffset).as("doc_id"),
            md5(concat(lit("fresh "), col("doc_id").cast("string"))).as("h")))
      old.select(col("doc_id"), col("h").as("h_old"))
        .join(nw.select(col("doc_id"), col("h").as("h_new")),
          Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        // membership checksum as a bit_xor fold, not a sum: with 10¹²
        // variant-offset ids, SUM(doc_id) grew ∝n·offset (0.50·2⁵³ at
        // the sf1 probe) — the xor is order-independent, pins the same
        // membership, and is magnitude-free at any corpus scale
        // (declared 64-bit signature in the output contract; round 14)
        .agg(count(lit(1)).as("n"), expr("bit_xor(doc_id)").as("id_xor"))
        .orderBy(col("status"))
    }),

    // Per-group standardization (feature z-scores within language): the
    // moments are EXACT integer sums (count, Σx, Σx²) — the one broadcast
    // dimension — and the per-row z is a fixed double expression over
    // those integers, so both engines evaluate the identical IEEE tree.
    // Narrow after the broadcast join: scoring runs at scan speed.
    "q_feature_zscore" -> ((s, dir) => {
      val m = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
          sum(col("n_chars") * col("n_chars")).as("ss"))
      docs(s, dir).join(broadcast(m), Seq("lang"))
        .select(col("doc_id"),
          round((col("n_chars").cast("double") -
              col("s").cast("double") / col("n").cast("double")) /
            sqrt((col("ss").cast("double") -
              col("s").cast("double") * col("s").cast("double") /
                col("n").cast("double")) / col("n").cast("double")), 6)
            .as("z"))
        .orderBy(col("doc_id"))
    }),

    // Leak-free train/val/test split: the split is a function of the
    // SOURCE (hash-gated 80/10/10), never the document — so near-dup docs
    // from one domain can never straddle splits. n_sources per (split,
    // lang) pins the grouping; disjointness holds by construction since
    // a deterministic function assigns each source exactly one split.
    // Quantile normalization (round 9): the rank-based feature transform
    // (map each value to its within-group quantile) — per-language
    // normalized rank of n_chars in integer milli-units, through the
    // value-bucketed distributed rank frame (never a per-group
    // single-partition window; tie-broken by doc_id, the declared
    // semantics the oracle replays).
    "q_quantile_norm" -> ((s, dir) => {
      graft.operators.Percentiles.globalRanksTieBroken(
          docs(s, dir).select(col("lang"), col("n_chars"), col("doc_id")),
          col("lang"), col("n_chars"), col("doc_id"))
        .select(col("group").as("lang"), col("tie").as("doc_id"),
          col("value").as("n_chars"),
          expr("CAST((1000 * rank) div n AS BIGINT)").as("qn_milli"))
        .orderBy(col("doc_id"))
    }),

    "q_split_leakfree" -> ((s, dir) => {
      val bucket = pmod(hash32(col("source")), lit(10L))
      docs(s, dir)
        .select(col("lang"), col("source"),
          when(bucket < 8, "train").when(bucket === 8, "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("split"), col("lang"))
    })
  )

  private val sqlToks = sqlTokens(sqlNormalizeText("text"))

  override def oracle: Map[String, String] = Map(
    "q_sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= $GapUs
         |         OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END
         |      AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
         |        ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
         |        AS session_idx FROM g)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |  COUNT(*) AS n_events,
         |  ${Parity.sqlDsum("value")} AS sum_value,
         |  CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_s
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_source_cap" ->
      s"""WITH ranked AS (
         |  SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY ${sqlHash32("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN rk <= $SourceCap THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN rk <= $SourceCap THEN doc_id ELSE 0 END)
         |    AS BIGINT) AS kept_id_sum
         |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "q_token_rarity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS token
         |             FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |freq AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c
         |         FROM tf GROUP BY 1),
         |thr AS (SELECT CAST(SUM(c) AS BIGINT) // COUNT(*) AS mean_c
         |        FROM freq)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  round(CAST(SUM(tf * c) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE), 6)
         |    AS mean_tok_freq,
         |  round(CAST(SUM(CASE WHEN c < (SELECT mean_c FROM thr)
         |                      THEN tf ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(tf) AS DOUBLE), 6) AS rare_frac
         |FROM tf JOIN freq USING (token)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_rrf_fusion" -> {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(list_zip($x, $y), " +
          "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"
      val cos = s"(${dot("c.embedding", "p.embedding")} / " +
        s"(sqrt(${dot("c.embedding", "c.embedding")}) * " +
        s"sqrt(${dot("p.embedding", "p.embedding")})))"
      s"""WITH dense AS (
         |  SELECT c.vec_id AS id, round($cos, 6) AS score
         |  FROM embeddings c, embeddings p
         |  WHERE p.vec_id = 0 AND c.vec_id != 0
         |  ORDER BY score DESC, id LIMIT 20),
         |dr AS (SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id)
         |         AS rank_dense FROM dense),
         |probe AS (SELECT DISTINCT unnest($sqlToks) AS token
         |          FROM documents WHERE doc_id = 0),
         |lex AS (
         |  SELECT t.doc_id AS id, COUNT(DISTINCT t.token) AS overlap
         |  FROM (SELECT doc_id, unnest($sqlToks) AS token
         |        FROM documents WHERE doc_id != 0) t
         |  JOIN probe USING (token) GROUP BY 1
         |  ORDER BY overlap DESC, id LIMIT 20),
         |lr AS (SELECT id, ROW_NUMBER() OVER (ORDER BY overlap DESC, id)
         |         AS rank_lex FROM lex)
         |SELECT COALESCE(dr.id, lr.id) AS id,
         |  CAST(COALESCE(1000000000 // ($RrfK + dr.rank_dense), 0)
         |     + COALESCE(1000000000 // ($RrfK + lr.rank_lex), 0) AS BIGINT)
         |    AS rrf_nano,
         |  dr.rank_dense, lr.rank_lex
         |FROM dr FULL OUTER JOIN lr ON dr.id = lr.id
         |ORDER BY rrf_nano DESC, id LIMIT 10""".stripMargin
    },

    "q_embed_project" -> {
      val cols = (0 until ProjDims).map { j =>
        s"round(list_sum(list_transform(generate_series(1, len(embedding)), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * (CASE WHEN " +
          s"('0x' || substr(md5(CAST($j*4096 + i AS VARCHAR)), 1, 8))::BIGINT" +
          s" % 2 = 0 THEN 1.0 ELSE -1.0 END))), 6) AS p$j"
      }.mkString(",\n  ")
      s"SELECT vec_id,\n  $cols\nFROM embeddings ORDER BY vec_id"
    },

    "q_histogram" ->
      """SELECT lang, CAST(LEAST(n_chars // 128, 15) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_docs, MIN(n_chars) AS lo, MAX(n_chars) AS hi
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_collocations" ->
      s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS token,
         |             generate_subscripts($sqlToks, 1) AS pos
         |             FROM documents),
         |uni AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n FROM tok),
         |bg AS (SELECT a.token AS t1, b.token AS t2, COUNT(*) AS c2
         |       FROM tok a JOIN tok b
         |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY 1, 2)
         |SELECT t1, t2, c2,
         |  CAST((c2 * (SELECT n FROM tot) * 1000000) // (u1.c * u2.c)
         |    AS BIGINT) AS pmi_micro
         |FROM bg JOIN uni u1 ON u1.token = bg.t1
         |JOIN uni u2 ON u2.token = bg.t2
         |WHERE c2 >= 5
         |ORDER BY pmi_micro DESC, t1, t2 LIMIT 20""".stripMargin,

    "q_lm_next_token" ->
      s"""WITH bg0 AS (SELECT lang, string_split(b, ' ') AS sp FROM (
         |    SELECT lang, unnest(${sqlWordNgrams("text", 2)}) AS b
         |    FROM documents)),
         |bg AS (SELECT lang, sp[1] AS t1, sp[2] AS t2, COUNT(*) AS c2
         |       FROM bg0 WHERE len(sp) = 2 GROUP BY 1, 2, 3),
         |pred AS (SELECT lang, t1, t2 AS p FROM (
         |    SELECT *, row_number() OVER (PARTITION BY lang, t1
         |      ORDER BY c2 DESC, t2) AS rn FROM bg)
         |  WHERE rn = 1)
         |SELECT bg.lang,
         |  CAST(SUM(bg.c2) AS BIGINT) AS total_bigrams,
         |  CAST(COALESCE(SUM(bg.c2) FILTER (WHERE bg.t2 = pred.p), 0)
         |    AS BIGINT) AS correct,
         |  CAST((1000 * COALESCE(SUM(bg.c2) FILTER (WHERE bg.t2 = pred.p),
         |    0)) // SUM(bg.c2) AS BIGINT) AS acc_milli
         |FROM bg JOIN pred ON bg.lang = pred.lang AND bg.t1 = pred.t1
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_edit" ->
      s"""WITH n AS (SELECT doc_id, lang, n_chars // 20 AS lb,
         |  substr(${sqlNormalizeText("text")}, 1, 12) AS blk,
         |  regexp_replace(substr(${sqlNormalizeText("text")}, 1, 200),
         |    '[^\\x20-\\x7e]', '?', 'g') AS p
         |  FROM documents)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
         |FROM n a JOIN n b
         |  ON a.lang = b.lang AND a.lb = b.lb AND a.blk = b.blk
         |  AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.p, b.p) <= 20
         |ORDER BY id1, id2""".stripMargin,

    "q_entity_match" ->
      """WITH base AS (SELECT p_partkey AS id, p_name AS name
        |  FROM part WHERE p_partkey < 1000),
        |dirty AS (SELECT id + 1000000000000 AS id,
        |    substr(name, 1, 3) || 'x' || substr(name, 5) AS name
        |  FROM base)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM base a JOIN dirty b ON
        |  (substr(a.name, 1, 3) = substr(b.name, 1, 3) OR
        |   substr(reverse(a.name), 1, 3) = substr(reverse(b.name), 1, 3))
        |  AND levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "q_key_collision" -> {
      val nameToks = sqlTokens(sqlNormalizeText("p_name"))
      val rawToks = sqlTokens("p_name")
      s"""WITH corpus AS (SELECT p_partkey, p_name FROM part
         |  UNION ALL
         |  SELECT p_partkey + 1000000000000,
         |    upper(array_to_string(list_reverse($rawToks), ' '))
         |  FROM part WHERE p_partkey % 7 = 0),
         |fp AS (SELECT p_partkey, p_name,
         |    array_to_string(list_sort(list_distinct($nameToks)), ' ')
         |      AS fp
         |  FROM corpus)
         |SELECT fp, COUNT(DISTINCT p_name) AS n_spellings,
         |  COUNT(*) AS n_rows, MIN(p_name) AS canonical
         |FROM fp GROUP BY 1
         |HAVING COUNT(DISTINCT p_name) >= 2
         |ORDER BY fp""".stripMargin
    },

    "q_daily_bands" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        |  FROM events),
        |r AS (SELECT d, v,
        |    ROW_NUMBER() OVER (PARTITION BY d ORDER BY v) AS rk FROM e),
        |n AS (SELECT d, COUNT(*) AS n FROM e GROUP BY 1)
        |SELECT r.d AS d,
        |  MIN(v) FILTER (WHERE rk = (n * 1 + 9) // 10) AS p10,
        |  MIN(v) FILTER (WHERE rk = (n * 1 + 1) // 2) AS p50,
        |  MIN(v) FILTER (WHERE rk = (n * 9 + 9) // 10) AS p90
        |FROM r JOIN n USING (d) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_skipgram_pmi" ->
      s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS token,
         |             generate_subscripts($sqlToks, 1) AS pos
         |             FROM documents),
         |uni AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n FROM tok),
         |pr AS (SELECT a.token AS t1, b.token AS t2, COUNT(*) AS c2
         |       FROM tok a JOIN tok b
         |         ON a.doc_id = b.doc_id
         |         AND b.pos > a.pos AND b.pos <= a.pos + 3
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
         |SELECT t1, t2, c2,
         |  CAST((CAST(c2 AS HUGEINT) * (SELECT n FROM tot) * 1000000)
         |    // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS pmi_micro
         |FROM pr JOIN uni u1 ON u1.token = pr.t1
         |JOIN uni u2 ON u2.token = pr.t2
         |ORDER BY pmi_micro DESC, t1, t2 LIMIT 20""".stripMargin,

    "q_interleave_sample" ->
      """SELECT lang, doc_id, rank FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rank
        |  FROM documents)
        |WHERE rank <= 20
        |ORDER BY rank, lang LIMIT 50""".stripMargin,

    "q_vocab_growth" -> {
      val toks = sqlToks
      s"""WITH tok AS (SELECT DISTINCT doc_id, token FROM (
         |    SELECT doc_id, unnest($toks) AS token FROM documents)),
         |cp AS (SELECT 100 * g.g AS cp
         |       FROM (SELECT unnest(generate_series(1, 5)) AS g) g)
         |SELECT CAST(cp AS BIGINT) AS cp,
         |  COUNT(DISTINCT token) AS vocab,
         |  COUNT(DISTINCT doc_id) AS n_docs
         |FROM tok JOIN cp ON doc_id < cp
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_release_pipeline" ->
      """WITH pass AS (SELECT doc_id, lang FROM documents
        |  WHERE n_chars BETWEEN 100 AND 2000),
        |r AS (SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (ORDER BY doc_id) AS rank,
        |    COUNT(*) OVER () AS n
        |  FROM pass),
        |negs AS (SELECT r.doc_id, r.lang
        |  FROM r CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS k) k
        |  WHERE ((rank - 1) * 2654435761 + k.k * 40503) % n + 1 != rank),
        |pl AS (SELECT lang, COUNT(*) AS n_pass FROM pass GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_pass) AS BIGINT) AS total,
        |    COUNT(*) AS k FROM pl),
        |nl AS (SELECT lang, COUNT(*) AS n_neg FROM negs GROUP BY 1),
        |d AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT d.lang, d.n_docs,
        |  COALESCE(pl.n_pass, 0) AS n_pass,
        |  COALESCE(nl.n_neg, 0) AS n_neg,
        |  (t.total * 1000000) // (t.k * pl.n_pass) AS weight_micro
        |FROM d
        |LEFT JOIN pl ON pl.lang = d.lang
        |LEFT JOIN nl ON nl.lang = d.lang
        |CROSS JOIN t
        |ORDER BY d.lang""".stripMargin,

    "q_class_weights" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |    COUNT(*) AS k FROM c)
        |SELECT lang, n_docs,
        |  (total * 1000000) // (k * n_docs) AS weight_micro
        |FROM c, t ORDER BY lang""".stripMargin,

    "q_impute_median" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END AS nc
        |  FROM documents),
        |r AS (SELECT lang, nc, ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY nc) AS rk
        |      FROM d WHERE nc IS NOT NULL),
        |n AS (SELECT lang, COUNT(*) AS n FROM d
        |      WHERE nc IS NOT NULL GROUP BY 1),
        |m AS (SELECT r.lang, MIN(nc) FILTER (WHERE rk = (n + 1) // 2)
        |        AS med
        |      FROM r JOIN n USING (lang) GROUP BY 1)
        |SELECT doc_id, CAST(COALESCE(nc, med) AS BIGINT)
        |    AS n_chars_imputed,
        |  nc IS NULL AS was_imputed
        |FROM d JOIN m USING (lang) ORDER BY doc_id""".stripMargin,

    "q_entity_match2" ->
      """WITH base AS (SELECT p_partkey AS id, p_name AS name
        |  FROM part WHERE p_partkey < 1000),
        |dirty AS (SELECT id + 1000000000000 AS id,
        |    substr(name, 1, 3) || 'x' || substr(name, 5, 7)
        |      || substr(name, 13) AS name
        |  FROM base)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM base a JOIN dirty b ON levenshtein(a.name, b.name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q_corpus_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
        |new AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 23 = 0 THEN text || ' v2'
        |        ELSE text END) AS h
        |  FROM documents WHERE doc_id % 17 != 3
        |  UNION ALL
        |  SELECT doc_id + 1000000000000,
        |    md5('fresh ' || CAST(doc_id AS VARCHAR))
        |  FROM documents WHERE doc_id % 11 = 5),
        |j AS (
        |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.h != n.h THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
        |SELECT status, COUNT(*) AS n,
        |  CAST(BIT_XOR(doc_id) AS BIGINT) AS id_xor
        |FROM j GROUP BY status ORDER BY status""".stripMargin,

    "q_feature_zscore" ->
      """WITH m AS (
        |  SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS s,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
        |  FROM documents GROUP BY lang)
        |SELECT doc_id,
        |  round((CAST(n_chars AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6) AS z
        |FROM documents JOIN m USING (lang) ORDER BY doc_id""".stripMargin,

    "q_quantile_norm" ->
      """SELECT lang, doc_id, n_chars,
        |  CAST((1000 * ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id))
        |    // (COUNT(*) OVER (PARTITION BY lang)) AS BIGINT) AS qn_milli
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_split_leakfree" ->
      s"""WITH tagged AS (
         |  SELECT lang, source,
         |    CASE WHEN ${sqlHash32("source")} % 10 < 8 THEN 'train'
         |         WHEN ${sqlHash32("source")} % 10 = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, lang, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT source) AS n_sources
         |FROM tagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
