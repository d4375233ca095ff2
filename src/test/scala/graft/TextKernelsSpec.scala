package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Native one-pass text kernels (plans/TextKernels) ≡ the composed
  * HOF pipelines they replace — on the real corpus AND on the edge strings
  * where tokenizer/regex semantics diverge between implementations.
  * The oracles are built from the composed SQL, so this equivalence is what
  * keeps the DuckDB gate valid for the native hot paths.
  */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    "",
    " ",
    "\t\n  \r",
    "a",
    "a b",
    "  Leading and TRAILING  ",
    "tabs\tand\nnewlines\r\nmixed   runs",
    "punct, and. Case! MIXED?",
    "über GRÜN straße ŁÓDŹ zażółć",
    "汉字 漢字 mixed ascii 中文",
    "one two three four five six seven eight nine ten")

  private def corpusPlus = Tables
    .load(spark, sf, "documents")
    .select(col("text"))
    .unionByName(edges.toDF("text"))

  private object Tables { // tiny alias to keep the call sites short
    def load(s: org.apache.spark.sql.SparkSession, dir: String, t: String) =
      graft.sources.Tables.load(s, dir, t)
  }

  test("WordNgramsExpr ≡ composed wordNgrams (n = 1, 2, 3, 5)") {
    for (n <- Seq(1, 2, 3, 5)) {
      val diff = corpusPlus
        .select(wordNgrams(col("text"), n).as("composed"),
          wordNgramsNative(col("text"), n).as("native"))
        .filter(not(col("composed") <=> col("native")))
        .count()
      assert(diff == 0, s"wordNgrams mismatch at n=$n")
    }
  }

  test("MinhashSigExpr ≡ composed staged signature (k = 1, 8, 16)") {
    for (k <- Seq(1, 8, 16)) {
      val diff = corpusPlus
        .select(
          minhashFromHashes(hashedShingles(wordNgrams(col("text"), 3)), k)
            .as("composed"),
          minhashSigNative(col("text"), 3, k).as("native"))
        .filter(not(col("composed") <=> col("native")))
        .count()
      assert(diff == 0, s"minhash signature mismatch at k=$k")
    }
  }

  test("Simhash32Expr ≡ composed simhash32FromHashes∘hashedTokens") {
    val diff = corpusPlus
      .select(simhash32FromHashes(hashedTokens(col("text"))).as("composed"),
        simhash32Native(col("text")).as("native"))
      .filter(not(col("composed") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("native kernels participate in whole-stage codegen") {
    val cg = corpusPlus
      .select(minhashSigNative(col("text"), 3, 8),
        simhash32Native(col("text")),
        wordNgramsNative(col("text"), 3))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("TextKernels.minhashSig"), "expected inlined static call")
    assert(cg.contains("TextKernels.simhash32"))
    assert(cg.contains("TextKernels.wordNgrams"))
  }
}
