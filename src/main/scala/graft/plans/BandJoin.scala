package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.Decimal

/** Whole-operator custom plan — level (c) of the custom-operator ladder
  * (SURVEY §2.9/§4): a broadcast **band join** `left.value BETWEEN right.lo
  * AND right.hi`, the interval generalization of the reference's literal
  * band/style dimension lookups (`/root/reference/src/from-ground-up.js:
  * 846-858` selects a style by class_code band).
  *
  * Vanilla Spark plans a non-equi theta join as BroadcastNestedLoopJoin —
  * every probe row scans the ENTIRE dimension. This operator sorts the
  * broadcast side by `lo` once per partition and binary-searches the probe
  * value, so each row touches only the `lo ≤ value` prefix (for banded /
  * mostly-disjoint dimensions: O(log m + matches) instead of O(m)). Same
  * inner-join null semantics as the BETWEEN condition: a null value or a
  * null bound never matches.
  *
  * Three pieces: [[BandJoin]] (logical node embedding analyzed children),
  * [[BandJoinStrategy]] (logical → physical, injected via
  * `GraftExtensions`), [[BandJoinExec]] (physical operator declaring a
  * `BroadcastDistribution` on the dimension side — EnsureRequirements
  * inserts the BroadcastExchange, so AQE/reuse work as for built-in joins).
  */
case class BandJoin(left: LogicalPlan, right: LogicalPlan,
    value: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoin =
    copy(left = newLeft, right = newRight)
}

object BandJoin {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

  /** DataFrame API over the custom node: `value BETWEEN lo AND hi` inner
    * join with `right` broadcast. Pass resolved columns (`left("v")`,
    * `right("lo")`, ...). Registers the planner strategy on the session. */
  def frame(left: DataFrame, right: DataFrame, value: Column,
      lo: Column, hi: Column): DataFrame = {
    val spark = left.sparkSession
    GraftExtensions.registerStrategy(spark)
    DatasetBridge.ofRows(spark, BandJoin(
      DatasetBridge.plan(left), DatasetBridge.plan(right),
      ColumnBridge.resolvedExpression(value),
      ColumnBridge.resolvedExpression(lo),
      ColumnBridge.resolvedExpression(hi)))
  }
}

/** Plans the explicit [[BandJoin]] node AND transparently claims plain
  * inner joins whose condition is an inclusive numeric band
  * (`v >= lo && v <= hi` in any conjunct order/orientation, value from the
  * left, bounds from the right) when the right side fits the broadcast
  * threshold — users writing the generic BETWEEN theta join get the
  * sorted-broadcast operator instead of BroadcastNestedLoopJoin, the
  * "declare the plan, let the planner pick the strategy" posture. Strict
  * bounds, extra conjuncts, non-numeric keys, outer joins, or a large
  * right side all fall through to the built-in strategies untouched. */
object BandJoinStrategy extends SparkStrategy
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual}
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical.Join

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]

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
          if v1.semanticEquals(v2) && Seq(v1, lo, hi).forall(numeric) =>
        Some((v1, lo, hi))
      case (Some((v1, hi, false)), Some((v2, lo, true)))
          if v1.semanticEquals(v2) && Seq(v1, lo, hi).forall(numeric) =>
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
    case BandJoin(l, r, v, lo, hi) =>
      BandJoinExec(planLater(l), planLater(r), v, lo, hi) :: Nil
    case j: Join if broadcastable(j.right) =>
      matchBand(j) match {
        case Some((v, lo, hi)) =>
          BandJoinExec(planLater(j.left), planLater(j.right), v, lo, hi) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

case class BandJoinExec(left: SparkPlan, right: SparkPlan,
    value: Expression, lo: Expression, hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: Decimal => d.toDouble
    case other =>
      throw new IllegalArgumentException(s"non-numeric band join key: $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val boundV = BindReferences.bindReference(value, left.output)
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      // sort the (small, broadcast) dimension once per partition and
      // precompute the running max of hi: scanning backwards from the
      // binary-searched upper bound, the first index whose prefix-max-hi
      // drops below the probe value proves no earlier entry can match —
      // for disjoint/banded dimensions each probe touches O(log m + matches)
      // entries instead of the whole lo ≤ v prefix
      val entries = bcast.value.flatMap { r =>
        val l = boundLo.eval(r)
        val h = boundHi.eval(r)
        if (l == null || h == null) None else Some((toD(l), toD(h), r))
      }.sortBy(_._1)
      val los = entries.map(_._1)
      val maxHiUpTo = new Array[Double](entries.length)
      var mi = 0
      var running = Double.NegativeInfinity
      while (mi < entries.length) {
        running = math.max(running, entries(mi)._2)
        maxHiUpTo(mi) = running
        mi += 1
      }
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val v = boundV.eval(lrow)
        if (v == null) Iterator.empty
        else {
          val vd = toD(v)
          // first index with lo > vd — candidates live strictly below it
          var a = 0
          var b = los.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (los(m) <= vd) a = m + 1 else b = m
          }
          val ub = a
          new Iterator[InternalRow] {
            private var i = ub - 1
            private def seek(): Unit = {
              while (i >= 0 && maxHiUpTo(i) >= vd && entries(i)._2 < vd) i -= 1
              if (i >= 0 && maxHiUpTo(i) < vd) i = -1 // nothing earlier can match
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
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}
