package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-11 stat/audit pack ([[graft.queries.StatOps]]):
  * each gate query's DEFINING invariant re-derived independently —
  * accounting identities, re-aggregability, brute-force argmax equality —
  * so the DuckDB parity gate is not the only line of defense.
  */
class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_survival_km: curve is a valid product-limit estimator") {
    val rows = SparkEntry.queries("q_survival_km")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 49)
    val n0 = rows.head._4 // n_risk at t=0 is the full cohort
    // accounting identity: every subject exits exactly once
    assert(rows.map(r => r._2 + r._3).sum == n0)
    // at-risk recurrence: n_{t+1} = n_t - d_t - c_t
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 == a._4 - a._2 - a._3, s"at-risk broke at t=${b._1}")
    }
    // survival is monotone nonincreasing from 1e6 and only drops on death
    assert(rows.head._5 <= 1000000L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5)
      if (b._2 == 0) assert(b._5 == a._5,
        s"S dropped without a death at t=${b._1}")
    }
    // first step is exactly (n0 - d0) / n0 in micro units
    assert(rows.head._5 == 1000000L * (n0 - rows.head._2) / n0)
  }

  test("q_changepoint: gate split equals the brute-force exact argmax") {
    // recompute the objective over the (bounded, ~30-day at this sf)
    // daily grid with BigInt arithmetic — no staging, no truncation
    val dayUs = 86400L * 1000000L
    val daily = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $dayUs")
        .as("day"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .as[(Long, Long)].collect().toMap
    val mn = daily.keys.min; val mx = daily.keys.max
    val series = (mn to mx).map(d => daily.getOrElse(d, 0L))
    val stot = series.map(BigInt(_)).sum; val ntot = series.length
    val cands = series.indices.dropRight(1).map { i =>
      val sl = series.take(i + 1).map(BigInt(_)).sum
      val nl = i + 1
      val b = (BigInt(1000000) * sl * sl) / nl +
        (BigInt(1000000) * (stot - sl) * (stot - sl)) / (ntot - nl)
      (mn + i, b)
    }
    val best = cands.maxBy(c => (c._2, BigInt(-c._1)))
    val row = SparkEntry.queries("q_changepoint")(spark, sf).collect().head
    assert(row.getAs[Long]("split_day") == best._1)
    assert(BigInt(row.getAs[Long]("b_e18")) ==
      best._2 / BigInt(10).pow(18))
    assert(row.getAs[Long]("n_left") + row.getAs[Long]("n_right") == ntot)
  }

  test("q_sequential_ab: monotone cumulatives; final look IS q_ab_experiment") {
    val seqRows = SparkEntry.queries("q_sequential_ab")(spark, sf)
      .orderBy(col("day")).collect()
    // cumulative counts never decrease and users dominate conversions
    seqRows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n0") >= a.getAs[Long]("n0"))
      assert(b.getAs[Long]("conv0") >= a.getAs[Long]("conv0"))
      assert(b.getAs[Long]("conv1") >= a.getAs[Long]("conv1"))
    }
    seqRows.foreach { r =>
      assert(r.getAs[Long]("conv0") <= r.getAs[Long]("n0"))
      assert(r.getAs[Long]("conv1") <= r.getAs[Long]("n1"))
    }
    // the last daily look must reproduce the one-shot experiment readout:
    // same variants, same user/conversion counts, same staged chi2
    val last = seqRows.last
    val ab = SparkEntry.queries("q_ab_experiment")(spark, sf)
      .orderBy(col("variant")).collect()
    assert(last.getAs[Long]("n0") == ab(0).getAs[Long]("n_users"))
    assert(last.getAs[Long]("n1") == ab(1).getAs[Long]("n_users"))
    assert(last.getAs[Long]("conv0") == ab(0).getAs[Long]("n_conv"))
    assert(last.getAs[Long]("conv1") == ab(1).getAs[Long]("n_conv"))
    assert(last.getAs[Long]("chi2_micro") == ab(0).getAs[Long]("chi2_micro"))
  }

  test("q_cem_match: treated accounting closes; ATT matches a local replay") {
    val row = SparkEntry.queries("q_cem_match")(spark, sf).collect().head
    // every treated customer is matched or counted unmatched
    val treatedTotal = graft.sources.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L)
        .otherwise(0L)).as("t"))
      .agg(sum(col("t"))).as[Long].collect().head
    assert(row.getAs[Long]("n_treated") + row.getAs[Long]("n_unmatched") ==
      treatedTotal)
    // replay the stratum arithmetic locally in BigInt (strata are bounded:
    // nation × segment ≤ 125 cells)
    val spend = graft.sources.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("cents"),
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("treated"))
    val strata = graft.sources.Tables.load(spark, sf, "customer")
      .join(spend, col("c_custkey") === col("ck"), "left")
      .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        coalesce(col("treated"), lit(0L)).as("t"),
        coalesce(col("cents"), lit(0L)).as("v"))
      .groupBy(col("nk"), col("seg"))
      .agg(sum(col("t")).as("nt"), sum(lit(1L) - col("t")).as("nc"),
        sum(when(col("t") === 1L, col("v")).otherwise(0L)).as("st"),
        sum(when(col("t") === 0L, col("v")).otherwise(0L)).as("sc"))
      .as[(Int, String, Long, Long, Long, Long)].collect()
    val matched = strata.filter(s => s._3 > 0 && s._4 > 0)
    val num = matched.map { s =>
      val qt = BigInt(1000000) * s._5 / s._3
      val qc = BigInt(1000000) * s._6 / s._4
      BigInt(s._3) * (qt - qc)
    }.sum
    val den = matched.map(_._3).sum
    val att = num / den // BigInt / truncates toward zero for these signs
    assert(BigInt(row.getAs[Long]("att_micro_cents")) == att)
    assert(row.getAs[Long]("n_strata") == matched.length)
  }

  test("q_k_anonymity: histogram partitions the table; flag is k < 5") {
    val rows = SparkEntry.queries("q_k_anonymity")(spark, sf).collect()
    val total = graft.sources.Tables.load(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") ==
        r.getAs[Long]("class_size") * r.getAs[Long]("n_classes"))
      assert(r.getAs[Boolean]("suppressed") == (r.getAs[Long]("class_size") < 5))
    }
  }

  test("q_fd_audit: a held dependency reports zero violations") {
    val rows = SparkEntry.queries("q_fd_audit")(spark, sf).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_lhs"))
      // violating groups hold ≥ 2 rows each
      assert(r.getAs[Long]("n_rows_violating") >=
        2 * r.getAs[Long]("n_violating"))
      assert(r.getAs[Long]("max_rhs") >= 1)
    }
    // independent replay of one FD: l_partkey -> l_suppkey violation count
    val viol = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("nd"))
      .filter(col("nd") > 1).count()
    assert(rows("lineitem.l_partkey->l_suppkey")
      .getAs[Long]("n_violating") == viol)
  }

  test("q_snapshot_diff: every class count re-derives from the mutation rules") {
    val r = SparkEntry.queries("q_snapshot_diff")(spark, sf).collect().head
    val keys = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey")).as[Long].collect()
    val removed = keys.count(_ % 101 == 0)
    val added = keys.count(_ % 103 == 0)
    val chgPrice = keys.count(k => k % 97 == 0 && k % 101 != 0)
    val chgSt = keys.count(k => k % 89 == 0 && k % 101 != 0)
    val changed = keys.count(k =>
      (k % 97 == 0 || k % 89 == 0) && k % 101 != 0)
    assert(r.getAs[Long]("n_added") == added)
    assert(r.getAs[Long]("n_removed") == removed)
    assert(r.getAs[Long]("n_chg_price") == chgPrice)
    assert(r.getAs[Long]("n_chg_status") == chgSt)
    assert(r.getAs[Long]("n_changed") == changed)
    assert(r.getAs[Long]("n_unchanged") ==
      keys.length - removed - changed)
  }

  test("q_quadkey_rollup: every level partitions the corpus; children sum to parents") {
    val rows = SparkEntry.queries("q_quadkey_rollup")(spark, sf)
      .as[(Int, String, Long, Double)].collect()
    val total = graft.sources.Tables.load(spark, sf, "customer").count()
    (1 to 4).foreach { l =>
      assert(rows.filter(_._1 == l).map(_._3).sum == total,
        s"level $l does not partition the corpus")
    }
    // re-aggregability: level-L cell count = Σ its level-(L+1) children
    (1 to 3).foreach { l =>
      val parents = rows.filter(_._1 == l).map(r => r._2 -> r._3).toMap
      val fromKids = rows.filter(_._1 == l + 1)
        .groupBy(_._2.substring(0, l)).map { case (p, ks) =>
          p -> ks.map(_._3).sum
        }
      assert(parents == fromKids, s"level $l != rollup of level ${l + 1}")
    }
    rows.foreach(r => assert(r._2.length == r._1 &&
      r._2.forall(c => c >= '0' && c <= '3')))
  }

  test("q_bm25: returned docs contain a query term; scores ranked") {
    val out = SparkEntry.queries("q_bm25")(spark, sf)
      .as[(Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 10)
    // ranking is by (score desc, doc_id asc)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    }
    assert(out.forall(_._2 > 0))
    val withTerm = graft.sources.Tables.load(spark, sf, "documents")
      .filter(col("text").rlike("(^| )(spark|dup)( |$)"))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(out.forall(r => withTerm.contains(r._1)))
  }
}
