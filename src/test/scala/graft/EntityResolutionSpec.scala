package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def matchPairs(left: Seq[(Long, String)],
      right: Seq[(Long, String)], maxKey: Int = 4096): Set[(Long, Long)] =
    EntityResolution.blockedMatch(
      left.toDF("id", "name"), col("id"), col("name"),
      right.toDF("id", "name"), col("id"), col("name"),
      maxEdit = 1, maxKey = maxKey)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet

  test("pigeonhole recall: every 1-edit variant of a name ≥ 7 chars is " +
    "caught, at every edit position and for ins/del too") {
    val name = "abcdefgh"
    val subs = (0 until name.length).map(p =>
      name.updated(p, if (name(p) == 'z') 'y' else 'z'))
    val dels = (0 until name.length).map(p =>
      name.substring(0, p) + name.substring(p + 1))
    val ins = (0 to name.length).map(p =>
      name.substring(0, p) + "z" + name.substring(p))
    val variants = (subs ++ dels ++ ins).zipWithIndex
      .map { case (n, i) => (1000L + i, n) }
    val found = matchPairs(Seq((1L, name)), variants)
    for ((vid, vname) <- variants)
      assert(found.contains((1L, vid)),
        s"1-edit variant '$vname' missed — pigeonhole guarantee broken")
  }

  test("boundary of validity: a middle substitution on a 5-char name " +
    "breaks BOTH blocking keys and is missed — pinned as documented") {
    // len 5: position 3 sits in the prefix (1-3) AND the suffix (3-5)
    val found = matchPairs(Seq((1L, "abcde")), Seq((2L, "abzde")))
    assert(!found.contains((1L, 2L)),
      "5-char middle edit unexpectedly caught — blocking doc is stale")
    // len 6: prefix (1-3) and suffix (4-6) are disjoint — always caught
    val found6 = (0 until 6).forall { p =>
      matchPairs(Seq((1L, "abcdef")),
        Seq((2L, "abcdef".updated(p, 'z')))).contains((1L, 2L))
    }
    assert(found6, "6-char substitutions must all be caught")
  }

  test("heavy-key census: a degenerate block is dropped whole; a planted " +
    "pair in a light block survives") {
    val boiler = (0 until 3000).map(i => (i.toLong, "the same product name"))
    val left = boiler :+ (100000L, "unique widget")
    val right = (0 until 3000).map(i => (i + 500000L, "the same product name")) :+
      (200000L, "unique widgex")
    val found = matchPairs(left, right, maxKey = 256)
    assert(found == Set((100000L, 200000L)),
      s"expected only the planted pair to survive the cap, got ${found.size}")
  }

  test("product cap: a key under maxKey on BOTH sides but over the " +
    "left*right pair budget is dropped whole, observably") {
    // 100 × 100 = 10,000 pairs from one key — both sides well under the
    // per-side cap (4096), so only the ADVICE-r9 product cap catches it.
    val boiler = (0 until 100).map(i => (i.toLong, "boilerplate name"))
    val left = boiler :+ (100000L, "unique widget")
    val right = (0 until 100).map(i => (i + 500000L, "boilerplate name")) :+
      (200000L, "unique widgex")
    val obs = org.apache.spark.sql.Observation("er_drops")
    val found = EntityResolution.blockedMatch(
        left.toDF("id", "name"), col("id"), col("name"),
        right.toDF("id", "name"), col("id"), col("name"),
        maxEdit = 1, maxKey = 4096, maxKeyPairs = 5000L, drops = Some(obs))
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(found == Set((100000L, 200000L)),
      s"expected only the planted pair to survive the product cap, got $found")
    // both of the boilerplate name's keys (prefix + suffix) are dropped
    assert(obs.get("dropped_keys").asInstanceOf[Long] == 2L,
      s"expected 2 dropped keys observed, got ${obs.get("dropped_keys")}")
    // same corpus under a roomy budget: the boilerplate block survives
    val roomy = matchPairs(left, right)
    assert(roomy.size == 100 * 100 + 1, s"roomy budget: got ${roomy.size}")
  }

  test("qgram blocking at maxEdit=2: recall 1.0 on planted 2-edit " +
    "variants (sub+sub, sub+del, ins+sub, del+del — incl. the shift " +
    "cases positional blocking misses), equals brute force") {
    val name = "monochrome lavender widget"
    def sub(s: String, p: Int) = s.updated(p, if (s(p) == 'z') 'y' else 'z')
    def del(s: String, p: Int) = s.substring(0, p) + s.substring(p + 1)
    def ins(s: String, p: Int) = s.substring(0, p) + "q" + s.substring(p)
    val variants = Seq(
      sub(sub(name, 1), 20), sub(sub(name, 4), 5), sub(del(name, 2), 10),
      del(sub(name, 15), 0), ins(sub(name, 12), 3), del(del(name, 8), 17),
      ins(ins(name, 0), 25), del(ins(name, 6), 22), sub(name, 13),
      del(name, 7), ins(name, 19), name)
      .zipWithIndex.map { case (n, i) => (1000L + i, n) }
    // decoys: similar-looking but > 2 edits away
    val decoys = Seq((5000L, "monochrome lavender gasket plus"),
      (5001L, "polychrome cavendish widget"))
    val out = EntityResolution.qgramMatch(
        Seq((1L, name)).toDF("id", "name"), col("id"), col("name"),
        (variants ++ decoys).toDF("id", "name"), col("id"), col("name"),
        maxEdit = 2, q = 2)
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(Long, Long, Int)].collect()
    val found = out.map(p => (p._1, p._2)).toSet
    for ((vid, vname) <- variants)
      assert(found.contains((1L, vid)),
        s"2-edit variant '$vname' missed — qgram prefix filter lost recall")
    // brute force over the same corpus pins exactness (no extras either)
    val brute = (variants ++ decoys).flatMap { case (vid, vname) =>
      val d = levenshteinDist(name, vname)
      if (d <= 2) Some((1L, vid)) else None
    }.toSet
    assert(found == brute, s"qgram pairs != brute force: $found vs $brute")
  }

  test("qgram boundary of validity: a sub-q name (zero q-grams) pairs " +
    "only with an identical short name — pinned as documented") {
    // "a" vs "abc": edit distance 2 ≤ maxEdit, but "a" has no bigram to
    // share — missed, per the documented |name| >= q envelope
    val out = EntityResolution.qgramMatch(
        Seq((1L, "a")).toDF("id", "name"), col("id"), col("name"),
        Seq((2L, "abc"), (3L, "a")).toDF("id", "name"),
        col("id"), col("name"), maxEdit = 2, q = 2)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(!out.contains((1L, 2L)),
      "sub-q name unexpectedly paired with a longer name — envelope doc is stale")
    assert(out.contains((1L, 3L)),
      "identical short names must still pair via the whole-name fallback key")
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }
}
