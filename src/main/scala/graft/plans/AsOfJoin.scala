package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution,
  IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.internal.SQLConf

/** Native AS-OF (backward) join — the brief's extension tier (c): a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, for the one whole-operator
  * semantics the Dataset API can't declare directly (pandas-on-Spark ships
  * merge_asof; vanilla SQL needs the window re-formulation
  * [[graft.operators.Relational.lastErrorBeforePurchase]] or an O(n·m)
  * range join).
  *
  * Semantics: for every left row, append the LATEST right row of the same
  * key with `rightTime <= leftTime` (ties inclusive — matching DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`, which the driver oracle uses); left rows
  * with no such match keep nulls (left-outer flavor).
  *
  * Physical contract (the 100 TB story): both children hash-cluster on the
  * key and sort (key, time) — EnsureRequirements inserts exactly one
  * Exchange per unaligned side, the same cost class as any shuffled join —
  * then [[AsOfJoinExec]] streams a per-partition MERGE holding exactly ONE
  * buffered right row (the current key's latest-so-far): O(|L|+|R|) time,
  * O(1) state, no join buffer, no per-key group materialization. Contrast
  * the window form, which unions both inputs through one shuffle — same
  * asymptotics, but the native operator never widens the left rows with
  * carried-state columns and keeps both inputs independently prunable.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    forward: Boolean = false, tolerance: Option[Long] = None)
  extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  // both exec paths build orderings / hash keys from the LEFT types, so a
  // type mismatch would compare raw internal values with different
  // semantics (TimestampType micros vs DateType days, Long vs Int) —
  // fail at plan construction, naming both types, instead
  require(
    org.apache.spark.sql.types.DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of join time column types must match: left '${leftTime.name}' is " +
      s"${leftTime.dataType.simpleString}, right '${rightTime.name}' is " +
      s"${rightTime.dataType.simpleString}")
  leftKeys.zip(rightKeys).foreach { case (lk, rk) =>
    require(
      org.apache.spark.sql.types.DataType.equalsStructurally(
        lk.dataType, rk.dataType, ignoreNullability = true),
      s"as-of join key types must match: left '${lk.name}' is " +
        s"${lk.dataType.simpleString}, right '${rk.name}' is " +
        s"${rk.dataType.simpleString}")
  }
  require(tolerance.forall(_ >= 0), "as-of tolerance must be non-negative")
  require(tolerance.isEmpty || {
    import org.apache.spark.sql.types._
    leftTime.dataType match {
      case TimestampType | TimestampNTZType | DateType |
           LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
  }, s"as-of tolerance needs an integral-comparable time type, " +
    s"got ${leftTime.dataType.simpleString}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Honest size estimate for planners ABOVE this node. Without it the
    * stats visitor falls back to its unknown-binary-node default — the
    * PRODUCT of the children's sizes — which makes any join stacked on an
    * as-of result look terabyte-scale and kills its broadcast eligibility.
    * As-of is 1:1 on left rows with right columns appended, so the output
    * is bounded by |left| · (leftWidth + rightWidth): estimate it by
    * scaling the left size by the width ratio (the SizeInBytesOnly
    * discipline — row counts unknown, bytes proportional).
    */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val widthL = math.max(1, left.output.map(a => a.dataType.defaultSize).sum)
    val widthR = right.output.map(a => a.dataType.defaultSize).sum
    val size = left.stats.sizeInBytes * (widthL + widthR) / widthL
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = size.max(1), rowCount = left.stats.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one custom exec per [[AsOfJoinPlan]] node — and the
  * STATISTICS-DRIVEN physical choice every shuffled operator owes its
  * users: when the right side's estimated size fits the session's
  * `autoBroadcastJoinThreshold`, plan [[BroadcastAsOfJoinExec]] (left side
  * untouched — no shuffle, no sort; the dim broadcasts like any small
  * dimension) instead of the shuffle-merge [[AsOfJoinExec]]. At sf0.01 the
  * error dimension broadcasts; at sf0.1+ the same query flips to the
  * merge — both paths driver-oracled. Injectable via
  * `SparkSessionExtensions.injectPlannerStrategy` or appended at runtime
  * to `spark.experimental.extraStrategies` (what [[AsOf.backward]] does,
  * so driver sessions need no build-time config). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, tol) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && r.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(lk, rk, lt, rt, fwd, tol,
            planLater(l), planLater(r))
        else
          AsOfJoinExec(lk, rk, lt, rt, fwd, tol, planLater(l), planLater(r))
      exec :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // hash-cluster both sides on the key: EnsureRequirements co-partitions
  // them (and reuses an existing partitioning when a side already complies
  // — e.g. a bucketed table joins shuffle-free here too)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition (key, time) order is what makes the single-pass merge
  // with O(1) buffered state correct
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lKeyExprs = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeyExprs = rightKeys.map(BindReferences.bindReference(_, right.output))
    val lTimeExpr = BindReferences.bindReference(leftTime, left.output)
    val rTimeExpr = BindReferences.bindReference(rightTime, right.output)
    // ship TYPES, not orderings — interpreted orderings are built per
    // partition (they are not serializable; same discipline as SMJ)
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
      val lKeyProj = UnsafeProjection.create(lKeyExprs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs)
      // consumers (incl. SparkPlan.getByteArrayRdd at a collect root)
      // require UnsafeRow output — flatten the JoinedRow like SMJ does
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow()

      // one-row lookahead over the right side
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTime: Any = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val cand = rIter.next()
          val t = rTimeExpr.eval(cand)
          // null right times can never satisfy rt <= lt, and SQL equi-join
          // semantics (and the DuckDB ASOF oracle) never match a NULL key —
          // skip both here so the held row is always a legal match candidate
          if (t != null) {
            val k = rKeyProj(cand)
            if (!k.anyNull) {
              rRow = cand
              rKey = k.copy()
              rTime = t
            }
          }
        }
      }
      advanceRight()

      // the O(1) held state (backward only): latest right row seen for the
      // key it carries
      var heldRow: InternalRow = null
      var heldKey: InternalRow = null
      var heldTime: Any = null
      // integral view of a time value for the tolerance bound (timestamps
      // surface as Long micros internally, dates as Int days)
      def toLong(v: Any): Long = v.asInstanceOf[Number].longValue
      def withinTol(earlier: Any, later: Any): Boolean =
        tolerance.forall(t => toLong(later) - toLong(earlier) <= t)

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeExpr.eval(l)
          val tOrd = timeOrdering.asInstanceOf[Ordering[Any]]
          var matched = false
          var matchRow: InternalRow = null
          // a NULL left key never equals anything (SQL equi-join semantics)
          // — emit the row null-extended without consuming right state
          if (lTime != null && !lKey.anyNull) {
            if (forward) {
              // consume right rows strictly BEFORE (lKey, lTime) — no later
              // left row (keys/times only grow) can need them; the match is
              // the lookahead row itself, left UNCONSUMED so every earlier
              // left row of the same key can share it
              var advancing = true
              while (advancing && rRow != null) {
                val c = keyOrdering.compare(rKey, lKey)
                if (c < 0 || (c == 0 && tOrd.lt(rTime, lTime))) advanceRight()
                else advancing = false
              }
              if (rRow != null && keyOrdering.compare(rKey, lKey) == 0 &&
                withinTol(lTime, rTime)) {
                matched = true; matchRow = rRow
              }
            } else {
              // consume every right row at-or-before (lKey, lTime); rows of
              // smaller keys pass through unheld, matching-key rows replace
              // the held row (later time wins — inputs are time-sorted)
              var advancing = true
              while (advancing && rRow != null) {
                val c = keyOrdering.compare(rKey, lKey)
                if (c < 0) advanceRight()
                else if (c == 0 && tOrd.lteq(rTime, lTime)) {
                  heldRow = rRow.copy(); heldKey = rKey; heldTime = rTime
                  advanceRight()
                } else advancing = false
              }
              if (heldRow != null && keyOrdering.compare(heldKey, lKey) == 0 &&
                withinTol(heldTime, lTime)) {
                matched = true; matchRow = heldRow
              }
            }
          }
          numOutputRows += 1
          if (matched) numMatched += 1
          resultProj(joined(l, if (matched) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast variant of the as-of join: the RIGHT side (a small dimension
  * — error log, rate table, calendar) broadcasts whole via Spark's own
  * BroadcastExchange (IdentityBroadcastMode), and each task builds a
  * per-key time-sorted index once, then answers every left row with a
  * binary search. The left side keeps its partitioning AND ordering — no
  * shuffle, no sort, the same reason small dims broadcast everywhere
  * else: at 100 TB the fact side never moves. Chosen automatically by
  * [[AsOfJoinStrategy]] when right-side stats fit the broadcast
  * threshold.
  *
  * WHOLE-STAGE CODEGEN (r8): implements `CodegenSupport` in the
  * BroadcastHashJoin pattern — the probe runs INSIDE the parent codegen
  * stage (no InputAdapter fence, no row-at-a-time `resultProj`): the
  * generated consume evaluates the left key/time in-register, binary-
  * searches the per-task [[AsOfKeyIndex]] (built once in mutable-state
  * init from the broadcast), and hands the left vars + matched right
  * columns straight to the parent's consume. Admitted when the time type
  * is integral-like (timestamps/dates/ints — everything the driver
  * workload uses); exotic time types fall back to the interpreted
  * `doExecute`, which keeps full generality. */
final case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def timeIsIntegral: Boolean = {
    import org.apache.spark.sql.types._
    leftTime.dataType match {
      case TimestampType | TimestampNTZType | DateType |
           LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
  }

  override def supportCodegen: Boolean = timeIsIntegral

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].inputRDDs()

  // 1:1 on left rows and matched rows are stable broadcast memory — no
  // reused buffers escape, so the parent never needs a defensive copy on
  // our account (the default would ask the broadcast-exchange child and
  // ClassCastException; same override Spark's own broadcast joins make)
  override def needCopyResult: Boolean =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].needCopyResult

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].produce(ctx, this)

  override def doConsume(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      input: Seq[org.apache.spark.sql.catalyst.expressions.codegen.ExprCode],
      row: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String = {
    import org.apache.spark.sql.catalyst.expressions.codegen.{
      CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")
    // driver side: materialize the broadcast + build recipe as references
    val broadcast = right.executeBroadcast[Array[InternalRow]]()
    val spec = AsOfIndexSpec(
      rightKeys.map(BindReferences.bindReference(_, right.output)),
      BindReferences.bindReference(rightTime, right.output),
      forward, tolerance.getOrElse(-1L))
    val broadcastRef = ctx.addReferenceObj("asofBroadcast", broadcast,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val specRef = ctx.addReferenceObj("asofIndexSpec", spec,
      classOf[AsOfIndexSpec].getName)
    val rowCls = classOf[InternalRow].getName
    val idxCls = classOf[AsOfKeyIndex].getName
    // per-task index build in mutable-state init — once per partition
    val idxTerm = ctx.addMutableState(idxCls, "asofIndex",
      v => s"$v = $specRef.buildIndex(($rowCls[]) $broadcastRef.value());")

    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(
      ctx, leftKeys.map(BindReferences.bindReference(_, left.output)))
    val timeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val matched = ctx.freshName("asofMatched")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val getV = CodeGenerator.getValue(matched, a.dataType, i.toString)
      ExprCode(
        code"""
          |boolean $isNull = ($matched == null) || $matched.isNullAt($i);
          |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getV);
        """.stripMargin,
        JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    s"""
       |${keyEv.code}
       |${timeEv.code}
       |$rowCls $matched = null;
       |if (!${timeEv.isNull} && !${keyEv.value}.anyNull()) {
       |  $matched = $idxTerm.lookup(${keyEv.value}, (long)(${timeEv.value}));
       |}
       |$numOutputRows.add(1);
       |if ($matched != null) $numMatched.add(1);
       |${consume(ctx, input ++ rightVars)}
     """.stripMargin
  }

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the whole point: left flows through untouched
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lKeyExprs = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeyExprs = rightKeys.map(BindReferences.bindReference(_, right.output))
    val lTimeExpr = BindReferences.bindReference(leftTime, left.output)
    val rTimeExpr = BindReferences.bindReference(rightTime, right.output)
    val timeType = leftTime.dataType
    val rightWidth = right.output.length
    val outputAttrs = output
    val fwd = forward
    val tol = tolerance
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions({ lIter =>
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[Any]]
      val lKeyProj = UnsafeProjection.create(lKeyExprs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs)
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow()
      def toLong(v: Any): Long = v.asInstanceOf[Number].longValue

      // per-task index: key -> (times, rows) sorted by time. The dim is
      // threshold-bounded, so the build is O(|R| log |R|) over a small R —
      // the same per-task cost class as a broadcast hash join's hashing.
      val index = new java.util.HashMap[InternalRow, (Array[Any], Array[InternalRow])]()
      locally {
        val grouped = new java.util.HashMap[
          InternalRow, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]()
        broadcastRows.value.foreach { r =>
          val t = rTimeExpr.eval(r)
          // null times never match, and NULL keys never equal anything
          // (SQL equi-join semantics) — keep both out of the index
          if (t != null && !rKeyProj(r).anyNull) {
            val k = rKeyProj(r).copy()
            var buf = grouped.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]()
              grouped.put(k, buf)
            }
            buf += ((t, r))
          }
        }
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1)(timeOrdering)
          index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
      }

      lIter.map { l =>
        val lTime = lTimeExpr.eval(l)
        var matchRow: InternalRow = null
        val lKey = lKeyProj(l)
        // NULL left keys never equal anything — null-extend without lookup
        if (lTime != null && !lKey.anyNull) {
          val entry = index.get(lKey)
          if (entry != null) {
            val (times, rows) = entry
            // binary search: position of the first time > lTime
            var lo = 0; var hi = times.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrdering.lteq(times(mid), lTime)) lo = mid + 1 else hi = mid
            }
            if (fwd) {
              // first time >= lTime: step back over the == run
              var i = lo
              while (i > 0 && timeOrdering.equiv(times(i - 1), lTime)) i -= 1
              if (i < times.length &&
                tol.forall(t => toLong(times(i)) - toLong(lTime) <= t))
                matchRow = rows(i)
            } else if (lo > 0 &&
              tol.forall(t => toLong(lTime) - toLong(times(lo - 1)) <= t)) {
              matchRow = rows(lo - 1)
            }
          }
        }
        numOutputRows += 1
        if (matchRow != null) numMatched += 1
        resultProj(joined(l, if (matchRow != null) matchRow else nullRight))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API for the native as-of join — pandas `merge_asof` surface:
  * backward (latest at-or-before), forward (earliest at-or-after), both
  * with an optional tolerance bound, expressed in the time column's
  * internal units (MICROSECONDS for timestamps, days for dates, raw for
  * integral columns). */
object AsOf {
  /** Backward as-of join `left` ⟕asof `right` on equal keys with the
    * latest `rightTimeCol <= leftTimeCol` (and `>= leftTime − tolerance`
    * when one is given). Column names resolve against each side's analyzed
    * output (alias the right side first when joining a table to itself —
    * fresh attributes keep the two sides distinct, exactly like Dataset
    * self-joins). Registers [[AsOfJoinStrategy]] in the session's
    * experimental strategies on first use.
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTimeCol: String, rightTimeCol: String,
               tolerance: Option[Long] = None): DataFrame =
    join(left, right, Seq(leftKey), Seq(rightKey), leftTimeCol, rightTimeCol,
      forward = false, tolerance)

  /** Multi-key backward as-of (composite equality keys — e.g. (tenant,
    * user) — with the same latest-at-or-before time semantics). */
  def backwardKeys(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTimeCol: String, rightTimeCol: String,
                   tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTimeCol, rightTimeCol,
      forward = false, tolerance)

  /** SALTED backward as-of — the hot-key mitigation for the shuffle-merge
    * exec (round-8 verdict #5). [[AsOfJoinExec]] requires
    * ClusteredDistribution on the key, so one hot key = one hot task, and
    * AQE's skew-join splitter only knows Spark's own SortMergeJoinExec —
    * it will never split a custom node. This applies the
    * [[graft.operators.Skew]] discipline AT THE API LAYER, where it
    * composes with the existing multi-key path instead of needing a new
    * exec: the LEFT side gets a deterministic per-row salt in [0, salts)
    * (hashed from its time column; xxhash64 of a NULL input is the
    * seed-derived constant, so null-time rows land on one fixed salt and
    * keep their no-match semantics — every salt sees the full right
    * side), the RIGHT side is replicated
    * once per salt value, and the join key becomes (key, salt). Each left
    * row still sees EVERY right row of its key (the replica with its own
    * salt), so the output is row-identical to [[backward]] — pinned by
    * AsOfSkewSpec — while the hot key's left rows spread over `salts`
    * merge tasks.
    *
    * Cost model (when to reach for it): right-side shuffle volume ×salts.
    * Right sides small enough to broadcast never get here (the strategy
    * picks [[BroadcastAsOfJoinExec]], which has no hot task to split);
    * use this when the right side is too big to broadcast AND the left
    * key distribution is known-skewed — the same judgment call as
    * [[graft.operators.Skew.saltedJoin]]. */
  def backwardSalted(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTimeCol: String, rightTimeCol: String,
                     tolerance: Option[Long] = None,
                     salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, explode, lit, pmod, xxhash64}
    require(salts > 0, s"salts must be positive, got $salts")
    val sl = left.withColumn("__asof_salt",
      pmod(xxhash64(col(leftTimeCol)), lit(salts.toLong)).cast("int"))
    val sr = right.withColumn("__asof_salt",
      explode(array((0 until salts).map(lit): _*)))
    backwardKeys(sl, sr,
      Seq(leftKey, "__asof_salt"), Seq(rightKey, "__asof_salt"),
      leftTimeCol, rightTimeCol, tolerance)
      .drop("__asof_salt")
  }

  /** Forward as-of join: the EARLIEST `rightTimeCol >= leftTimeCol` (and
    * `<= leftTime + tolerance` when one is given) per key. Same physical
    * contract as backward; the merge needs no buffered row at all — the
    * lookahead right row is the match, shared by every earlier left row
    * of its key. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTimeCol: String, rightTimeCol: String,
              tolerance: Option[Long] = None): DataFrame =
    join(left, right, Seq(leftKey), Seq(rightKey), leftTimeCol, rightTimeCol,
      forward = true, tolerance)

  private def join(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTimeCol: String, rightTimeCol: String,
                   forward: Boolean, tolerance: Option[Long]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"as-of join: no column '$name' in [${p.output.map(_.name).mkString(", ")}]"))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTimeCol), attr(rp, rightTimeCol), forward, tolerance))
  }
}
