package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` aggregate the per-area [[graft.queries.QueryPack]]s;
  * every declared operator from SURVEY §2 surfaces here as a named query with
  * (where SQL-expressible) a DuckDB oracle over the same parquet tables.
  */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] = Seq(
    Relational,
    Analytic,
    Functions,
    JoinsExtra,
    Geo,
    TextOps,
    PipelineOps,
    SimOps,
    StreamOps,
    Completeness,
    Analytic2,
    Analytic3,
    CurateOps,
    RankOps,
    TpchOps,
    TpchOps2,
    BehaviorOps,
    QualityOps,
    MlOps,
    StatOps,
    StatOps2,
    StatOps3,
    StatOps4,
    StatOps5,
    StatOps6,
    StatOps7,
    StatOps8,
    StatOps9,
    StatOps10,
    EvalOps,
    ForecastOps,
    StatOps11,
    AttribOps,
    StatOps12,
    GraphOps,
    SketchOps,
    FairOps,
    SeqOps,
    StatOps13,
    SpectralOps,
    StatOps14,
    SurvOps,
    CalibOps,
    DedupAuditOps,
    LearnOps,
    DesignOps,
    SelectOps
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** Fails loudly if two packs declare the same gate-query key. A silent
    * `toMap` collision lets one pack shadow another's implementation AND
    * oracle while the gate stays green (the shadowing pair is internally
    * consistent) — the shadowed query becomes dead code that coverage
    * accounting still counts. Found once (q_histogram, round 9); this
    * assertion kills the class.
    */
  private def mergeUnique[V](kvs: Seq[(String, V)], what: String): Map[String, V] = {
    val dups = kvs.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
    require(dups.isEmpty,
      s"duplicate gate-query $what key(s) across packs: ${dups.mkString(", ")}")
    kvs.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergeUnique(packs.flatMap(_.defs), "impl")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mergeUnique(packs.flatMap(_.oracle), "oracle")
}
