package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Whole-operator custom plan — level (c) of the custom-operator ladder
  * (SURVEY §2.9/§4): a broadcast **band join** `left.value BETWEEN right.lo
  * AND right.hi`, the interval generalization of the reference's literal
  * band/style dimension lookups (`/root/reference/src/from-ground-up.js:
  * 846-858` selects a style by class_code band).
  *
  * Vanilla Spark plans a non-equi theta join as BroadcastNestedLoopJoin —
  * every probe row scans the ENTIRE dimension. This operator sorts the
  * broadcast side by `lo` (once per executor, cached by broadcast id) and
  * binary-searches the probe value under a prefix-max-of-hi bound — for
  * banded/mostly-disjoint dimensions O(log m + matches) per row instead of
  * O(m).
  *
  * Semantics match the BETWEEN condition exactly, including Spark's total
  * order on doubles (NaN greater than everything — all comparisons go
  * through `java.lang.Double.compare`): a null value or bound never
  * matches; a NaN `hi` matches any value; a NaN probe matches only NaN
  * bounds. Join keys are restricted to types exactly representable in
  * double (float/double/int/short/byte) — long/decimal keys above 2^53
  * would compare differently than the built-in exact join, so they fall
  * through to it.
  *
  * Three pieces: [[BandJoin]] (logical node embedding analyzed children),
  * [[BandJoinStrategy]] (explicit node → physical) +
  * [[BandJoinAutoStrategy]] (opt-in transparent claiming of plain BETWEEN
  * joins), [[BandJoinExec]] (physical operator declaring a
  * `BroadcastDistribution` on the dimension side — EnsureRequirements
  * inserts the BroadcastExchange, so AQE/reuse work as for built-in joins).
  */
case class BandJoin(left: LogicalPlan, right: LogicalPlan,
    value: Expression, lo: Expression, hi: Expression,
    leftOuter: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoin =
    copy(left = newLeft, right = newRight)
}

object BandJoin {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

  /** Exactly representable in double — the supported band-key domain. */
  private[plans] def exactInDouble(t: DataType): Boolean = t match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** DataFrame API over the custom node: `value BETWEEN lo AND hi` inner
    * join with `right` broadcast. Pass resolved columns (`left("v")`,
    * `right("lo")`, ...). Registers only the explicit-node strategy on the
    * session — transparent claiming of plain joins stays opt-in
    * ([[GraftExtensions.registerAutoBandJoin]]). */
  def frame(left: DataFrame, right: DataFrame, value: Column,
      lo: Column, hi: Column, joinType: String = "inner"): DataFrame = {
    val leftOuter = joinType match {
      case "inner" => false
      case "left" | "left_outer" => true
      case other => throw new IllegalArgumentException(
        s"band join supports inner and left_outer, got $other")
    }
    val spark = left.sparkSession
    GraftExtensions.registerStrategy(spark)
    val (v, l, h) = (ColumnBridge.resolvedExpression(value),
      ColumnBridge.resolvedExpression(lo), ColumnBridge.resolvedExpression(hi))
    Seq(v, l, h).foreach { e =>
      require(exactInDouble(e.dataType),
        s"band join keys must be float/double/int/short/byte " +
          s"(exact in double); got ${e.dataType.catalogString}")
    }
    // Size-guard the explicit API: the auto strategy only claims joins whose
    // right side fits autoBroadcastJoinThreshold, but `frame` broadcasts
    // whatever it is given — an oversized dimension would OOM the driver
    // and every executor instead of failing with a plan-time error.
    val conf = spark.sessionState.conf
    // any value < 0 disables the guard; 0 would reject every dimension, so
    // it is refused here rather than silently breaking each frame() call
    val guardKey = "spark.graft.bandJoin.maxBroadcastBytes"
    val guard = spark.conf.getOption(guardKey)
      .map { raw =>
        val parsed =
          try raw.trim.toLong
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$guardKey must be a byte count in long range " +
                s"(or negative to disable the guard); got '$raw'")
          }
        require(parsed != 0,
          s"$guardKey = 0 would reject every dimension; set a positive " +
            s"byte budget, or a negative value to disable the guard")
        parsed
      }
      .getOrElse {
        val t = conf.autoBroadcastJoinThreshold
        if (t > 0) math.max(t * 8, 256L << 20) else 1L << 30
      }
    val estimated = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (guard >= 0 && estimated > guard)
      throw new IllegalArgumentException(
        s"band join dimension estimated at $estimated bytes exceeds the " +
          s"broadcast guard ($guard). The dimension side is always broadcast " +
          s"whole to every executor. If the dimension is genuinely small and " +
          s"the estimate is inherited from a large parent (size-only stats " +
          s"propagate through filters), materialize it first " +
          s"(localCheckpoint/persist) or enable CBO; otherwise " +
          s"shrink/aggregate it, raise spark.graft.bandJoin.maxBroadcastBytes " +
          s"(-1 disables), or use a plain BETWEEN join.")
    DatasetBridge.ofRows(spark,
      BandJoin(DatasetBridge.plan(left), DatasetBridge.plan(right), v, l, h,
        leftOuter))
  }
}

/** Plans the explicit [[BandJoin]] node (registered automatically by
  * [[BandJoin.frame]]). */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoin(l, r, v, lo, hi, outer) =>
      BandJoinExec(planLater(l), planLater(r), v, lo, hi, outer) :: Nil
    case _ => Nil
  }
}

/** Opt-in transparent claiming: matches plain inner joins whose condition
  * is an inclusive numeric band (`v >= lo && v <= hi` in any conjunct
  * order/orientation, value from the left, bounds from the right, all keys
  * exact-in-double) with a broadcast-sized right side — users writing the
  * generic BETWEEN theta join get the sorted-broadcast operator instead of
  * BroadcastNestedLoopJoin. Strict bounds, cross-side extra conjuncts,
  * long/decimal keys, outer joins, or a large right side fall through to
  * the built-in strategies untouched.
  *
  * Deliberately NOT registered by [[BandJoin.frame]]: claiming built-in
  * shapes changes how *unrelated* queries in the session plan, so it is an
  * explicit session-level opt-in ([[GraftExtensions.registerAutoBandJoin]]
  * or `withExtensions(new GraftExtensions)`). */
object BandJoinAutoStrategy extends SparkStrategy
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual}
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical.Join

  private def exact(e: Expression): Boolean = BandJoin.exactInDouble(e.dataType)

  /** (value, lo, hi) when the join condition is exactly an inclusive band. */
  private def matchBand(j: Join): Option[(Expression, Expression, Expression)] = {
    if (j.joinType != Inner) return None
    val cs = splitConjunctivePredicates(j.condition.getOrElse(return None))
    if (cs.length != 2) return None
    def fromL(e: Expression) = e.references.subsetOf(j.left.outputSet)
    def fromR(e: Expression) = e.references.subsetOf(j.right.outputSet)
    // normalize a conjunct to (value, bound, boundIsLower)
    def norm(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case GreaterThanOrEqual(a, b) if fromL(a) && fromR(b) => Some((a, b, true))
      case LessThanOrEqual(b, a) if fromL(a) && fromR(b) => Some((a, b, true))
      case LessThanOrEqual(a, b) if fromL(a) && fromR(b) => Some((a, b, false))
      case GreaterThanOrEqual(b, a) if fromL(a) && fromR(b) => Some((a, b, false))
      case _ => None
    }
    (norm(cs.head), norm(cs(1))) match {
      case (Some((v1, lo, true)), Some((v2, hi, false)))
          if v1.semanticEquals(v2) && Seq(v1, lo, hi).forall(exact) =>
        Some((v1, lo, hi))
      case (Some((v1, hi, false)), Some((v2, lo, true)))
          if v1.semanticEquals(v2) && Seq(v1, lo, hi).forall(exact) =>
        Some((v1, lo, hi))
      case _ => None
    }
  }

  private def broadcastable(p: LogicalPlan): Boolean = {
    val threshold =
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    threshold > 0 && p.stats.sizeInBytes >= 0 &&
      p.stats.sizeInBytes <= threshold
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // j.hint non-empty bails out: a user-supplied BROADCAST/NO_BROADCAST
    // hint must keep built-in hint-aware planning — this strategy would
    // otherwise claim the join before those strategies ever see it.
    case j: Join
        if j.hint == org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE &&
          broadcastable(j.right) =>
      matchBand(j) match {
        case Some((v, lo, hi)) =>
          BandJoinExec(planLater(j.left), planLater(j.right), v, lo, hi,
            leftOuter = false) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

case class BandJoinExec(left: SparkPlan, right: SparkPlan,
    value: Expression, lo: Expression, hi: Expression,
    leftOuter: Boolean = false) extends BinaryExecNode {
  import BandJoinExec.{cmp, SortedDim}

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case other => throw new IllegalArgumentException(
      s"band join key not exactly representable in double: $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val boundV = BindReferences.bindReference(value, left.output)
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    // Cache key must carry the bound lo/hi shapes, not just the broadcast
    // id: with exchange reuse (spark.sql.exchange.reuse=true) two band
    // joins over the same dimension child share ONE BroadcastExchange and
    // thus one id — keyed by id alone, the second join would silently
    // reuse the first join's sorted bounds. Bound references are
    // position-based, so their canonicalized form distinguishes bound
    // column pairs without depending on exprIds.
    val cacheKey = BandJoinExec.CacheKey(bcast.id,
      boundLo.canonicalized.toString, boundHi.canonicalized.toString)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      // evaluate + sort the dimension once per executor (cached on the
      // broadcast id — re-sorting a 64 MB dimension per task would repeat
      // O(m log m) work and duplicate the tuple array per task). Prefix
      // max of hi: scanning backwards from the binary-searched upper
      // bound, the first index whose prefix-max-hi drops below the probe
      // value proves no earlier entry can match.
      val dim = BandJoinExec.sortedDim(cacheKey, {
        val entries = bcast.value.flatMap { r =>
          val l = boundLo.eval(r)
          val h = boundHi.eval(r)
          if (l == null || h == null) None else Some((toD(l), toD(h), r))
        }.sortBy(_._1) // 2.13 TotalOrdering: NaN sorts greatest, like Spark
        val maxHiUpTo = new Array[Double](entries.length)
        var mi = 0
        var running = Double.NegativeInfinity
        while (mi < entries.length) {
          if (cmp(entries(mi)._2, running) > 0) running = entries(mi)._2
          maxHiUpTo(mi) = running
          mi += 1
        }
        SortedDim(entries, entries.map(_._1), maxHiUpTo)
      })
      val entries = dim.entries
      val los = dim.los
      val maxHiUpTo = dim.maxHiUpTo
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = org.apache.spark.sql.catalyst.InternalRow
        .fromSeq(Seq.fill(right.output.length)(null))
      val outer = leftOuter
      iter.flatMap { lrow =>
        val v = boundV.eval(lrow)
        if (v == null) {
          if (outer) Iterator.single(project(joined(lrow, nullRight)))
          else Iterator.empty
        } else {
          val vd = toD(v)
          // first index with lo > vd (total order) — candidates below it
          var a = 0
          var b = los.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (cmp(los(m), vd) <= 0) a = m + 1 else b = m
          }
          val ub = a
          val matches = new Iterator[InternalRow] {
            private var i = ub - 1
            private def seek(): Unit = {
              while (i >= 0 && cmp(maxHiUpTo(i), vd) >= 0 &&
                cmp(entries(i)._2, vd) < 0) i -= 1
              if (i >= 0 && cmp(maxHiUpTo(i), vd) < 0) i = -1 // nothing earlier
            }
            seek()
            override def hasNext: Boolean = i >= 0
            override def next(): InternalRow = {
              val out = project(joined(lrow, entries(i)._3))
              i -= 1
              seek()
              out
            }
          }
          if (outer && !matches.hasNext)
            Iterator.single(project(joined(lrow, nullRight)))
          else matches
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}

object BandJoinExec {
  /** Spark's total order on doubles (NaN greatest, -0 < 0) — the semantics
    * of the BETWEEN condition this operator replaces. */
  private def cmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)

  case class SortedDim(entries: Array[(Double, Double, InternalRow)],
      los: Array[Double], maxHiUpTo: Array[Double])

  /** (broadcast id, canonicalized bound lo, canonicalized bound hi) — the
    * id alone is NOT unique under exchange reuse (see doExecute). */
  case class CacheKey(broadcastId: Long, lo: String, hi: String)

  /** Small per-JVM LRU of sorted dimensions keyed by [[CacheKey]] — one
    * sort per executor per (broadcast, bound pair), bounded so a
    * long-lived session re-running band joins does not accumulate dead
    * entries. */
  private val MaxCached = 8
  private val cache =
    new java.util.LinkedHashMap[CacheKey, SortedDim](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[CacheKey, SortedDim]): Boolean =
        size() > MaxCached
    }

  private def sortedDim(key: CacheKey, build: => SortedDim): SortedDim =
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val built = build
        cache.put(key, built)
        built
      }
    }
}
