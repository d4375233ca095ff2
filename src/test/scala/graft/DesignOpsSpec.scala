package graft

import org.apache.spark.sql.functions._

/** Semantics for the study-design tranche ([[graft.queries.DesignOps]]):
  * BigInt scalar replays of the CEM ATT and the Neyman allocation, plus
  * the accounting laws (every treated order is matched or counted
  * unmatched; allocations are nonnegative and sum within floor losses
  * of the budget).
  */
class DesignOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_cem_att equals the BigInt per-stratum replay and the treated " +
      "accounting closes") {
    val lc = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    val os = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
      .flatMap { case (ok, tr, y) => lc.get(ok).map(c => (c, tr, y)) }
    val strata = os.groupBy(_._1).map { case (st, xs) =>
      (st, xs.count(_._2 == 1L).toLong,
        xs.filter(_._2 == 1L).map(x => BigInt(x._3)).sum,
        xs.count(_._2 == 0L).toLong,
        xs.filter(_._2 == 0L).map(x => BigInt(x._3)).sum)
    }
    val matched = strata.filter(s => s._2 > 0 && s._4 > 0)
    val ntM = matched.map(_._2).sum
    def tdiv(a: BigInt, b: BigInt) = (a - a % b) / b // trunc-signed
    val csum = matched.map { case (_, nt, st, nc, sc) =>
      tdiv(BigInt(1000000) * (st * nc - BigInt(nt) * sc), BigInt(nc))
    }.sum
    val unmatched = strata.filter(_._4 == 0).map(_._2).sum
    val row = SparkEntry.queries("q_cem_att")(spark, sf).collect().head
    assert(row.getAs[Long]("nt_matched") == ntM)
    assert(row.getAs[Long]("n_unmatched_treated") == unmatched)
    assert(BigInt(row.getAs[Long]("att_micro")) == tdiv(csum, BigInt(ntM)))
    // accounting: matched + unmatched = all treated orders
    assert(ntM + unmatched == os.count(_._2 == 1L).toLong)
    // priority is independent of price given size on this corpus: the
    // matched ATT must not read a LARGE spurious effect. Band: 25% of
    // the overall mean order value — at sf0.001 the ~450 treated
    // orders carry ~9% pure sampling noise (measured 8.6%), so a
    // tight null band would test the fixture's sample size, not the
    // estimator
    val meanY = os.map(x => BigInt(x._3)).sum / os.length
    assert(BigInt(row.getAs[Long]("att_micro")).abs <
      BigInt(1000000) * meanY / 4)
  }

  test("q_mantel_haenszel equals the BigInt stratum replay; with no " +
      "size confounding the pooled and crude ORs agree closely") {
    val lc = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    val os = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val sorted = os.map(_._3).sorted
    val med = sorted((sorted.length + 1) / 2 - 1)
    val rows = os.flatMap { case (ok, e, cents) =>
      lc.get(ok).map(c => (c, e, if (cents > med) 1L else 0L)) }
    val strata = rows.groupBy(_._1).map { case (st, xs) =>
      (st, xs.count(x => x._2 == 1 && x._3 == 1).toLong,
        xs.count(x => x._2 == 1 && x._3 == 0).toLong,
        xs.count(x => x._2 == 0 && x._3 == 1).toLong,
        xs.count(x => x._2 == 0 && x._3 == 0).toLong,
        xs.length.toLong) }
    val r = strata.map { case (_, a, _, _, d, ni) =>
      BigInt(1000000000) * a * d / ni }.sum
    val q = strata.map { case (_, _, b, c, _, ni) =>
      BigInt(1000000000) * b * c / ni }.sum
    val (ta, tb, tc, td) = (strata.map(_._2).sum, strata.map(_._3).sum,
      strata.map(_._4).sum, strata.map(_._5).sum)
    val row = SparkEntry.queries("q_mantel_haenszel")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_strata") == strata.size.toLong)
    assert(BigInt(row.getAs[Long]("r_nano")) == r)
    assert(BigInt(row.getAs[Long]("s_nano")) == q)
    assert(BigInt(row.getAs[Long]("or_mh_ppm")) == BigInt(1000000) * r / q)
    assert(BigInt(row.getAs[Long]("or_crude_ppm")) ==
      BigInt(1000000) * ta * td / (BigInt(tb) * tc))
    // line count does not confound priority⇄value here: pooled vs
    // crude must agree within 10% relative
    val mh = row.getAs[Long]("or_mh_ppm").toDouble
    val cr = row.getAs[Long]("or_crude_ppm").toDouble
    assert(math.abs(mh - cr) / cr < 0.10, s"MH $mh vs crude $cr")
  }

  test("q_neyman_alloc equals the BigInt replay; allocations are " +
      "nonnegative and sum within floor losses of the budget") {
    val cs = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    val cells = cs.groupBy(_._1).map { case (seg, xs) =>
      val nh = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._2)).sum
      val qx = xs.map(x => BigInt(x._2) * x._2).sum
      val v = (qx - (sx * sx - (sx * sx) % nh) / nh) / (nh - 1)
      val s = BigInt(math.floor(math.sqrt(v.toDouble)).toLong)
      (seg, nh, v, s)
    }.toArray.sortBy(_._1)
    val totNs = cells.map(c => c._2 * c._4).sum
    val rows = SparkEntry.queries("q_neyman_alloc")(spark, sf)
      .collect().map(r => (r.getAs[String]("segment"),
        r.getAs[Long]("nh"), r.getAs[Long]("var_c2"),
        r.getAs[Long]("s_cents"), r.getAs[Long]("alloc_n")))
      .sortBy(_._1)
    assert(rows.length == cells.length)
    rows.zip(cells).foreach { case ((seg, nh, v, s, a), c) =>
      assert(seg == c._1)
      assert(BigInt(nh) == c._2)
      assert(BigInt(v) == c._3, s"$seg variance")
      assert(BigInt(s) == c._4, s"$seg sigma")
      assert(BigInt(a) == BigInt(1000) * c._2 * c._4 / totNs,
        s"$seg allocation")
      assert(a >= 0L && a <= 1000L)
    }
    val total = rows.map(_._5).sum
    assert(total <= 1000L && total >= 1000L - rows.length,
      s"floor losses exceed |strata|: $total")
  }
}
