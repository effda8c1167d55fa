package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** AS-OF join as a first-class Catalyst operator (SURVEY §2.6 — a relational
  * operator the reference engine lacks and Spark's DataFrame API does not
  * expose): for every left row, attach the right row with the same key and
  * the greatest right time <= left time (optionally within a tolerance).
  *
  * The composed alternative (union + RANGE window, `AnalyticsQueries
  * .asofPurchaseClick`) materializes a merged stream and a window state per
  * row. This operator instead asks Catalyst for the exact physical layout a
  * 100-TB run wants — hash co-partitioning on the key and an in-partition
  * (key, time) sort, both declared via `requiredChildDistribution` /
  * `requiredChildOrdering` so EnsureRequirements plans the minimal shuffles —
  * then streams a single forward merge pass over each co-partition: O(|L|+|R|)
  * per partition, no window state, no row buffered beyond the one candidate
  * match. Both sides spill through SortExec, never in this operator.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    inner: Boolean)
  extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "asof: need at least one equi-key and matching key arity")

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Left-side predicate pushdown through [[AsOfJoinPlan]]. Catalyst's own
  * PushDownPredicates knows nothing about foreign nodes, so without this rule
  * a `filter` written after an as-of join sits above the join — and the
  * filter's selectivity is lost to the shuffle. An as-of join emits exactly
  * one row per left row (left outer) or a subset (inner) and never alters
  * left columns, so any conjunct referencing only left output commutes with
  * the join on both join types. Registered via [[GraftExtensions]] /
  * `AsOf.ensureRegistered`; at 100 TB this is the difference between
  * shuffling the full probe table and shuffling the filtered slice.
  */
object PushLeftFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, inner) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, inner) :: Nil
    case _ => Nil
  }
}

/** Partitioned merge as-of join.
  *
  * Children are hash-clustered on the equi-keys (EnsureRequirements makes the
  * two sides co-partitioned, exactly as for sort-merge join) and sorted by
  * (keys..., time). Each zipped partition pair is then merged in one forward
  * pass: the right cursor only ever advances, and the sole retained state is
  * a copy of the latest right row whose (key, time) is <= the current left
  * row's — the as-of candidate. Per-partition memory is O(1 row); skew in the
  * left table costs time, not memory.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    inner: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  // Time values compare as Long: micros for (ntz) timestamps, days for dates.
  private def timeIndexable(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType | DateType => true
    case _ => false
  }
  require(leftTime.dataType == rightTime.dataType && timeIndexable(leftTime.dataType),
    s"asof: time columns must share an orderable temporal/integral type, " +
      s"got ${leftTime.dataType}/${rightTime.dataType}")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "asof: key data types must match pairwise")

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys) = (leftKeys, rightKeys)
    val (lTime, rTime) = (leftTime, rightTime)
    val keyTypes = lKeys.map(_.dataType)
    val timeIsInt = lTime.dataType == IntegerType || lTime.dataType == DateType
    val tol = toleranceUs
    val emitUnmatched = !inner
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(lKeys, lOut)
      val rkProj = UnsafeProjection.create(rKeys, rOut)
      val ltProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rtProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // Bind against the OUTPUT attributes (right side nullability-widened
      // for outer joins), not the children's: binding against a
      // non-nullable child attribute elides the null check and an unmatched
      // row's null-filled right side would read back as 0/default. (Caught
      // by AsOfJoinPropertySpec — parquet children are nullable, so the
      // oracle queries never tripped it.)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTime = 0L
        private var pending: InternalRow = _
        // Nullness is tracked out-of-band: an in-band sentinel (the old
        // Long.MinValue) silently treated a legitimate MinValue time as NULL.
        private var timeNull = false

        private def time(proj: UnsafeProjection, row: InternalRow): Long = {
          val t = proj(row)
          timeNull = t.isNullAt(0)
          if (timeNull) 0L
          else if (timeIsInt) t.getInt(0).toLong
          else t.getLong(0)
        }

        private def advance(): Unit = {
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lkProj(l)
            val lt = time(ltProj, l)
            // SQL equi-join semantics: NULL keys never equal anything —
            // including each other (RowOrdering compares null==null as 0,
            // so without this guard two NULL-keyed rows would join). A
            // NULL probe time likewise matches nothing.
            var done = timeNull || lk.anyNull
            val lNoMatch = done
            while (!done && rBuf.hasNext) {
              val rk = rkProj(rBuf.head)
              if (rk.anyNull) rBuf.next() // NULL build key joins nothing
              else {
                val cmp = keyOrd.compare(rk, lk)
                if (cmp < 0) rBuf.next()
                else if (cmp > 0) done = true
                else {
                  val rt = time(rtProj, rBuf.head)
                  if (timeNull) rBuf.next() // null build time: skip
                  else if (rt <= lt) {
                    matchTime = rt
                    matchRow = rBuf.next().copy()
                    matchKey = lk.copy()
                  } else done = true
                }
              }
            }
            val hit = !lNoMatch && matchRow != null &&
              keyOrd.compare(matchKey, lk) == 0 && tol.forall(lt - matchTime <= _)
            if (hit) {
              numMatched += 1
              pending = resultProj(joined(l, matchRow))
            } else if (emitUnmatched) {
              pending = resultProj(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = {
          if (pending == null) advance()
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty asof partition")
          val out = pending
          pending = null
          numOutputRows += 1
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** `SparkSessionExtensions` installer — the production registration path:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`). Installs the as-of
  * join (strategy + pushdown rule) and the SQL bindings for graft's custom
  * expressions ([[graft.functions.GraftFunctions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PushLeftFilterThroughAsOf)
    graft.functions.GraftFunctions.all.foreach(e.injectFunction)
  }
}

/** DataFrame-level entry point. */
object AsOf {
  /** Idempotent per-session registration for sessions built without
    * [[GraftExtensions]] (uses the stable `experimental` seam).
    */
  def ensureRegistered(s: SparkSession): Unit = synchronized {
    val e = s.experimental
    if (!e.extraStrategies.contains(AsOfJoinStrategy))
      e.extraStrategies = e.extraStrategies :+ AsOfJoinStrategy
    if (!e.extraOptimizations.contains(PushLeftFilterThroughAsOf))
      e.extraOptimizations = e.extraOptimizations :+ PushLeftFilterThroughAsOf
  }

  /** As-of join `left` (probe) with `right` (build): for each left row, the
    * right row with `rightOn == leftOn` and the greatest `rightTimeCol` <=
    * `leftTimeCol`, optionally within `toleranceUs` microseconds (days for
    * DateType columns). `joinType` "left" keeps unmatched probes with a null
    * right side; "inner" drops them. Output columns are left's then right's —
    * rename overlapping right columns before joining.
    *
    * NULL semantics match a SQL equi-join (and DuckDB's ASOF): a NULL in any
    * key column or in the time column joins nothing — a left row with one is
    * emitted unmatched (left) or dropped (inner).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      toleranceUs: Option[Long] = None,
      joinType: String = "left"): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val inner = joinType match {
      case "inner" => true
      case "left" => false
      case other => throw new IllegalArgumentException(
        s"asof joinType must be 'left' or 'inner', got '$other'")
    }
    val lp = PlanBridge.analyzed(left)
    val rp0 = PlanBridge.analyzed(right)
    // Self-join hygiene: both frames may descend from the same relation and
    // then share attribute ids; re-alias the right side so the join output
    // carries distinct ids (what DeduplicateRelations does for built-in Join).
    val rp =
      if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    // Name matching uses the session's resolver (case-insensitive under the
    // default spark.sql.caseSensitive=false, like every built-in API) and
    // fails on ambiguity instead of silently picking the first duplicate.
    val resolver = spark.sessionState.conf.resolver
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"asof: no column '$name' on the $side side " +
            s"(have ${plan.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"asof: column '$name' is ambiguous on the $side side " +
            s"(matches ${many.map(_.name).mkString(", ")})")
      }
    PlanBridge.ofRows(spark, AsOfJoinPlan(
      lp, rp,
      leftOn.map(resolve(lp, _, "left")), rightOn.map(resolve(rp, _, "right")),
      resolve(lp, leftTimeCol, "left"), resolve(rp, rightTimeCol, "right"),
      toleranceUs, inner))
  }
}
