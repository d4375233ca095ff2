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

  private val packs: Seq[QueryPack] = Seq(
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
    BehaviorOps,
    QualityOps,
    MlOps
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
