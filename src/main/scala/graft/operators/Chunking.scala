package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the step that turns variable-length
  * documents into fixed-size training sequences: windows of `windowSize`
  * tokens advancing by `stride` (< windowSize ⇒ overlapping context, the
  * usual long-doc recipe; = windowSize ⇒ disjoint blocks).
  *
  * Scale shape: entirely narrow — tokens materialize ONCE per doc (own
  * projection; the tokenizer is multi-referenced downstream and would
  * otherwise re-run per chunk), window starts come from `sequence()` +
  * `explode` (a generator, not a join), and each chunk row slices the
  * already-built array. No shuffle anywhere: a 100 TB corpus chunks at
  * scan speed and the output inherits the input's partitioning. Window
  * arithmetic is plain integer math, replayed verbatim by the DuckDB
  * oracle (`generate_series` + `list_slice`).
  */
object Chunking {

  /** One row per (doc, window): (id, chunk_id, start, n_chunk_tokens,
    * chunk_text). `start` is a 0-based token offset; chunk_id = start /
    * stride; the last window of a doc may be short (callers drop or pad).
    * Docs with zero tokens emit nothing. */
  def tokenWindows(df: DataFrame, idCol: Column, tokensCol: Column,
      windowSize: Int, stride: Int): DataFrame = {
    require(windowSize >= 1, s"window size must be positive, got $windowSize")
    require(stride >= 1 && stride <= windowSize,
      s"stride must lie in [1, windowSize], got $stride (size $windowSize)")
    df.select(idCol.as("id"), tokensCol.as("__toks"))
      .select(col("id"), col("__toks"), size(col("__toks")).as("__n"))
      .filter(col("__n") > 0)
      .select(col("id"), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("start"))
      .select(col("id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        least(lit(windowSize), col("__n") - col("start")).cast("int")
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("start") + 1, lit(windowSize)), " ")
          .as("chunk_text"))
  }
}
