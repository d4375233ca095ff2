package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-11 third tranche ([[graft.queries.StatOps3]]):
  * brute-force recomputes of the ABC cut, the midrank U statistic, and
  * the Holt fold, independent of the distributed plans.
  */
class StatOps3Spec extends SparkSpec {
  import spark.implicits._

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  test("q_abc_class: classes partition parts; cut equals brute force") {
    val rev = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey")).agg(sum(cents(col("l_extendedprice")))
        .as("cents"))
      .as[(Long, Long)].collect()
    val stot = rev.map(r => BigInt(r._2)).sum
    var cum = BigInt(0)
    val classes = rev.sortBy(r => (-r._2, r._1)).map { case (pk, c) =>
      cum += c
      val abc = if (cum * 100 <= stot * 80) "A"
      else if (cum * 100 <= stot * 95) "B" else "C"
      (abc, c)
    }
    val expected = classes.groupBy(_._1).map { case (k, v) =>
      k -> (v.length.toLong, v.map(x => BigInt(x._2)).sum)
    }
    val got = SparkEntry.queries("q_abc_class")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == expected.keys.toSeq.sorted)
    got.foreach { case (abc, n, c, share) =>
      assert((n, BigInt(c)) == expected(abc), s"class $abc")
      assert(BigInt(share) == BigInt(1000000) * c / stot)
    }
    assert(got.map(_._2).sum == rev.length.toLong)
    assert(got.map(r => BigInt(r._3)).sum == stot)
  }

  test("q_mann_whitney equals the brute-force midrank statistic") {
    val v = graft.sources.Tables.load(spark, sf, "orders")
      .select(cents(col("o_totalprice")).as("v"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
      .as[(Long, Boolean)].collect()
    val sorted = v.map(_._1).sorted
    // midrank×2 per value from the sorted positions (1-based): for a
    // tied block [i, j], midrank×2 = i + j
    val first = sorted.zipWithIndex.groupBy(_._1)
      .map { case (x, ps) => x -> (ps.map(_._2).min + 1L,
        ps.map(_._2).max + 1L) }
    val r1x2 = v.filter(_._2).map(r => first(r._1)._1 + first(r._1)._2)
      .sum
    val n1 = v.count(_._2).toLong; val n2 = v.length - n1
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val ties = sorted.groupBy(identity).values
      .map(g => BigInt(g.length).pow(3) - g.length).sum
    val row = SparkEntry.queries("q_mann_whitney")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("u1x2") == u1x2)
    assert(BigInt(row.getAs[Long]("ties")) == ties)
    // U₁ + U₂ = n₁·n₂ accounting identity, doubled form
    assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2)
    val nn = (n1 + n2).toDouble
    val z = (u1x2 / 2.0 - n1.toDouble * n2 / 2.0) /
      math.sqrt(n1.toDouble * n2 / 12.0 *
        ((nn + 1.0) - ties.toDouble / (nn * (nn - 1.0))))
    assert(row.getAs[Double]("z") == BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q_holt_linear equals the scalar fold; forecasts are linear") {
    val dayUs = 86400L * 1000000L
    val daily = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $dayUs")
        .as("day"), cents(col("l_extendedprice")).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .as[(Long, Long)].collect().toMap
    val mn = daily.keys.min; val mx = daily.keys.max
    val series = (mn to mx).map(d => daily.getOrElse(d, 0L))
    var l = series.head * 1000L; var b = 0L
    series.tail.foreach { y =>
      val ln = (3 * y * 1000L + 7 * (l + b)) / 10
      b = ((ln - l) + 9 * b) / 10
      l = ln
    }
    val got = SparkEntry.queries("q_holt_linear")(spark, sf)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.length == 8)
    assert(got.head == ((0L, l)))
    got.foreach { case (h, f) => assert(f == l + h * b) }
  }

  test("q_holt_linear: an over-span corpus (corrupt far-future shipdate) " +
      "fails LOUDLY at the bounds guard instead of silently collecting a " +
      "corpus-wide daily array") {
    // a fixture whose date span (year 1995 → 9999) exceeds
    // Parity.MaxSpanCells by orders of magnitude — exactly the corrupt-
    // date shape the guard exists for
    val dir = java.nio.file.Files
      .createTempDirectory("holt_overspan").toString
    Seq(("1995-01-01 00:00:00", 100.0), ("9999-01-01 00:00:00", 200.0))
      .toDF("d", "l_extendedprice")
      .select(col("d").cast("timestamp").as("l_shipdate"),
        col("l_extendedprice"))
      .write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_holt_linear")(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds the")),
      s"expected the span-guard raise_error, got: $e")
  }
}
