package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("json source round-trips features (JSON-lines and multiLine array)") {
    val dir = Files.createTempDirectory("graft_json").toString
    val rows = Seq(
      """{"name":"Parking","type":"Parking","table":"points_of_interest"}""",
      """{"name":"Cabin","type":"Cabin","table":"points_of_interest"}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/lines.json"),
      rows.mkString("\n"))
    val ld = Tables.readJson(spark, s"$dir/lines.json")
    assert(ld.count() == 2 &&
      ld.columns.toSet == Set("name", "type", "table"))

    // whole-array document, like the reference fixture test/string.json
    Files.writeString(java.nio.file.Paths.get(s"$dir/arr.json"),
      "[" + rows.mkString(",") + "]")
    val arr = Tables.readJson(spark, s"$dir/arr.json", multiLine = true)
    assert(arr.count() == 2)
  }

  test("csv source honors header, schema, delimiter") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "id|name\n1|alpha\n2|beta\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Tables.readCsv(spark, s"$dir/t.csv", Some(schema),
      delimiter = "|")
    val got = df.as[(Long, String)].collect().sortBy(_._1)
    assert(got.sameElements(Array((1L, "alpha"), (2L, "beta"))))
  }

  test("orc source round-trips a corpus table with pushdown intact") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val nation = Tables.load(spark, sf, "nation")
    nation.write.mode("overwrite").orc(s"$dir/nation_orc")
    val back = Tables.readOrc(spark, s"$dir/nation_orc")
    assert(back.count() == nation.count())
    assert(back.schema == nation.schema)
    // filter + projection reach the ORC scan like the parquet path
    val plan = back.filter(org.apache.spark.sql.functions.col("n_regionkey") === 1)
      .select("n_name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,1)]"),
      s"expected ORC pushdown in:\n$plan")
  }

  test("partitioned write + partition-pruned read (the 100 TB layout key)") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_part").toString
    val o = Tables.load(spark, sf, "orders")
    o.write.partitionBy("o_orderstatus").parquet(s"$dir/orders_part")
    val back = spark.read.parquet(s"$dir/orders_part")
      .filter(col("o_orderstatus") === "F")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= F)"),
      s"status filter must prune partitions at the scan:\n$plan")
    assert(back.count() ==
      o.filter(col("o_orderstatus") === "F").count())
  }

  test("parquet corpus loader serves every declared table") {
    Tables.corpus.foreach { t =>
      val df = Tables.load(spark, sf, t)
      assert(df.count() > 0, s"$t is empty")
    }
    // events ts arrives as a proper timestamp despite NANOS storage
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
  }
}
