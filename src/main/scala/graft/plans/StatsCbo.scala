package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{avg, col, count, countDistinct, length, lit, max, min, percentile_approx, sum, typedLit, when}
import org.apache.spark.sql.types._

/** Stats-driven broadcast-join selection — the cost-based half of the
  * engine's optimizer story (x156 collects ANALYZE statistics, x158
  * estimates join cardinality from them; this rule puts those numbers
  * INTO the planner).
  *
  * Why Spark's default misses the case: the built-in broadcast decision
  * uses the relation's FILE size, and with CBO off a `Filter` keeps its
  * child's estimate — so a 10 GB dimension filtered to 50 rows still
  * plans as a sort-merge join, shuffling the fact table to meet 50 rows.
  * This rule estimates the POST-FILTER size from registered column
  * statistics (System-R selectivities: 1/ndv for equality, range
  * fraction from min/max, the x158 arithmetic) and, when the estimate
  * clears the broadcast threshold, sets the join's BROADCAST hint — the
  * same decision a Delta/Iceberg CBO makes from its ANALYZE metadata.
  *
  * Honesty contract: estimates only SHRINK a side below the threshold —
  * an unrecognized predicate contributes selectivity 1.0 (never guesses
  * smaller), and a side with no registered stats is never hinted, so a
  * wrong registration is the only way to mis-broadcast (same failure
  * mode as every stats-based optimizer; re-ANALYZE re-keys). Existing
  * hints (user-set or injected by an earlier rule) are never overridden.
  *
  * Scale shape: the whole point is 100 TB behavior — a broadcast join
  * avoids shuffling the fact side entirely; the rule's own cost is a
  * registry lookup per join side at optimization time, zero when the
  * registry is empty.
  */
object StatsCbo {

  /** Per-column statistics. `hist`, when non-empty, is an EQUI-DEPTH
    * histogram: B+1 ascending boundaries (hist(0) = min … hist(B) = max),
    * each of the B buckets holding ~1/B of the rows — the System-R
    * refinement that makes range selectivity distribution-aware: a
    * min/max-linear estimate on a skewed column (90 % of values in the
    * bottom 1 % of the range) misestimates `x > t` by 10×; the histogram
    * counts full buckets below the bound plus a linear share of the
    * straddling bucket. Empty hist falls back to the linear estimate.
    */
  final case class ColStats(ndv: Long, lo: Option[Double], hi: Option[Double],
      hist: Seq[Double] = Nil)
  final case class TableStats(rows: Long, avgRowBytes: Long,
      cols: Map[String, ColStats])

  /** Registered statistics, keyed by the dataset path as the scan's file
    * index reports it (registration normalizes either form). Process-wide
    * like the session's own catalog stats; `clear()` for test isolation.
    */
  private val registry = TrieMap.empty[String, TableStats]

  def register(path: String, stats: TableStats): Unit =
    registry.put(normalize(path), stats)
  def clear(): Unit = registry.clear()
  def isEmpty: Boolean = registry.isEmpty
  def lookup(path: String): Option[TableStats] = registry.get(normalize(path))

  /** One normalizer for every plans-package path registry — a new URI
    * form (authority prefixes, object stores) is handled here once.
    */
  private[plans] def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** Equi-depth buckets per histogram (boundaries = HistBuckets + 1). */
  val HistBuckets = 32

  /** One-pass ANALYZE (the x156 shape): exact ndv + min/max + average
    * row width + an approximate equi-depth histogram per numeric column
    * (`approx_percentile` over HistBuckets+1 even quantiles — the
    * GK-sketch the built-in ANALYZE also uses; boundary error only
    * blurs bucket EDGES, estimates stay within one bucket of exact).
    * Exact `countDistinct` is fine at fixture scale; at 100 TB the HLL
    * aggregate (x153) replaces it — same registry, same rule.
    */
  def analyze(spark: SparkSession, path: String): TableStats = {
    val df = spark.read.parquet(path)
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: NumericType | _: TimestampType | _: DateType => true
      case _ => false
    }).map(_.name)
    val strings = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val qs = (0 to HistBuckets).map(_.toDouble / HistBuckets)
    val aggs = count(lit(1)).as("n") +:
      (numeric.flatMap(c => Seq(
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__lo"),
        max(col(c)).cast("double").as(s"${c}__hi"),
        percentile_approx(col(c).cast("double"),
          typedLit(qs), lit(10000)).as(s"${c}__hist"))) ++
        strings.flatMap(c => Seq(
          countDistinct(col(c)).as(s"${c}__ndv"),
          avg(length(col(c))).as(s"${c}__len"))))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rows = r.getAs[Long]("n")
    val cols = (numeric.map { c =>
      val hist = Option(r.getAs[scala.collection.Seq[Double]](s"${c}__hist"))
        .map(_.toSeq).getOrElse(Seq.empty[Double])
      c -> ColStats(r.getAs[Long](s"${c}__ndv"),
        Option(r.getAs[java.lang.Double](s"${c}__lo")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double](s"${c}__hi")).map(_.doubleValue),
        hist)
    } ++ strings.map { c =>
      c -> ColStats(r.getAs[Long](s"${c}__ndv"), None, None)
    }).toMap
    val strBytes = strings.map(c =>
      Option(r.getAs[java.lang.Double](s"${c}__len")).map(_.doubleValue).getOrElse(0.0))
      .sum
    val width = math.max(8L, 8L * numeric.length + math.ceil(strBytes).toLong)
    TableStats(rows, width, cols)
  }

  def analyzeAndRegister(spark: SparkSession, path: String): TableStats = {
    val st = analyze(spark, path); register(path, st); st
  }

  /** Largest registered row count among the single-root scans a plan
    * reads — the registry's answer to "how big is the data this
    * DataFrame derives from?". Used by scale gates (the graph
    * node-broadcast gate) that need a row-magnitude estimate WITHOUT
    * running a count job: a derived dimension (degrees, survivor sets)
    * is row-bounded by a small constant multiple of its source scan, so
    * the max scan row count is a conservative proxy. None when no scan
    * in the plan is registered — callers fall back to counting.
    */
  def maxScanRows(plan: LogicalPlan): Option[Long] = {
    val rows = plan.collect {
      case lr: LogicalRelation => scanPath(lr).flatMap(lookup).map(_.rows)
    }.flatten
    if (rows.isEmpty) None else Some(rows.max)
  }

  /** Single-root scans only (mirroring the JoinElimination guard): a
    * multi-directory read whose FIRST root happens to be registered
    * would otherwise be estimated from one directory's stats while
    * actually being a much larger union.
    */
  private[plans] def scanPath(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
        fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
}

/** The optimizer rule: estimate each un-hinted join side from the
  * registry; if its post-filter size estimate clears the session's
  * `spark.sql.autoBroadcastJoinThreshold` magnitude (using 10 MB when
  * the threshold is disabled — the rule exists precisely for setups
  * where the size-based default can't see through filters), set the
  * BROADCAST hint on that side. Installed by [[GraftExtensions]].
  */
object StatsBroadcastJoin extends Rule[LogicalPlan] {

  private val DefaultThreshold = 10L * 1024 * 1024

  /** Idempotent registration on a session built without extensions (the
    * [[SummaryRewrite]] discipline); [[GraftExtensions]] installs the
    * same rule for `spark.sql.extensions` deployments.
    */
  def install(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraOptimizations.contains(StatsBroadcastJoin))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ StatsBroadcastJoin
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (StatsCbo.isEmpty) return plan // zero cost until stats are registered
    plan.transformUp {
      case j @ Join(left, right, joinType, _, hint)
          if hint == JoinHint.NONE =>
        val lEst = estimateBytes(left)
        val rEst = estimateBytes(right)
        val t = threshold()
        val canL = t > 0 && canBroadcastLeft(joinType) && lEst.exists(_ <= t)
        val canR = t > 0 && canBroadcastRight(joinType) && rEst.exists(_ <= t)
        // prefer the smaller estimated side when both qualify
        val pickL = canL && (!canR || lEst.get <= rEst.get)
        if (pickL)
          j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
        else if (canR)
          j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
        else j
    }
  }

  /** Broadcast ceiling for the hint. The session's own
    * `autoBroadcastJoinThreshold` wins when enabled; when the operator
    * DISABLED it (<= 0 — the post-OOM "never broadcast" idiom) this rule
    * must not silently override that safety setting, so the 10 MB
    * fallback only applies when `spark.graft.cbo.broadcastThreshold`
    * explicitly opts back in (set to a byte count, or "default" for
    * 10 MB). Absent that opt-in, a disabled session threshold disables
    * this rule too (returns -1 → no hint).
    */
  private def threshold(): Long = {
    val session = conf.autoBroadcastJoinThreshold
    if (session > 0) session
    else conf.getConfString("spark.graft.cbo.broadcastThreshold", "") match {
      case "" => -1L
      case "default" => DefaultThreshold
      case v => try v.toLong catch { case _: NumberFormatException => -1L }
    }
  }

  private def canBroadcastRight(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
    case _ => false
  }
  private def canBroadcastLeft(jt: JoinType): Boolean = jt match {
    case Inner | Cross | RightOuter => true
    case _ => false
  }

  /** Post-filter size estimate for a side, defined only when the side is
    * a Project/Filter chain over a registered scan (anything else —
    * aggregates, joins, unions — is left to Spark's own estimates).
    */
  private def estimateBytes(side: LogicalPlan): Option[Long] = side match {
    case Project(_, child) => estimateBytes(child)
    case Filter(cond, child) => estimateBytes(child).map { base =>
      // selectivity applies to the CHILD's rows; bytes scale linearly
      math.ceil(base * selectivity(cond, statsOf(child))).toLong
    }
    case lr: LogicalRelation => pathOf(lr).flatMap(StatsCbo.lookup)
      .map(st => st.rows * st.avgRowBytes)
    case _ => None
  }

  private def statsOf(side: LogicalPlan): Option[StatsCbo.TableStats] =
    side match {
      case Project(_, child) => statsOf(child)
      case Filter(_, child) => statsOf(child)
      case lr: LogicalRelation => pathOf(lr).flatMap(StatsCbo.lookup)
      case _ => None
    }

  private def pathOf(lr: LogicalRelation): Option[String] =
    StatsCbo.scanPath(lr)

  /** System-R selectivities (the x158 arithmetic): 1/ndv for equality,
    * |list|/ndv for IN, range fraction from [lo, hi] for comparisons;
    * AND multiplies, OR adds (capped), NOT complements. Anything
    * unrecognized is 1.0 — estimates never shrink on a guess.
    */
  private def selectivity(e: Expression, st: Option[StatsCbo.TableStats]): Double = {
    def colStats(ex: Expression): Option[StatsCbo.ColStats] = ex match {
      case a: AttributeReference => st.flatMap(_.cols.get(a.name))
      case _ => None
    }
    def litD(ex: Expression): Option[Double] = ex match {
      case Literal(v, dt) => dt match {
        case _: NumericType => Some(v.toString.toDouble)
        case _ => None
      }
      case _ => None
    }
    // fraction of rows with value < bound (above = complement): from the
    // equi-depth histogram when one is registered — full buckets below
    // the bound count 1/B each, the straddling bucket contributes its
    // linear share — else the min/max-linear System-R fallback
    def fracBelow(cs: StatsCbo.ColStats, bound: Double): Option[Double] = {
      val h = cs.hist
      if (h.length >= 3) {
        if (bound <= h.head) Some(0.0)
        else if (bound >= h.last) Some(1.0)
        else {
          val b = h.length - 1 // bucket count
          val i = h.lastIndexWhere(_ <= bound) // straddling bucket index
          val within =
            if (h(i + 1) > h(i)) (bound - h(i)) / (h(i + 1) - h(i)) else 0.0
          Some(math.min(1.0, (i + within) / b))
        }
      } else None
    }
    def rangeFrac(cs: StatsCbo.ColStats, bound: Double, below: Boolean): Double =
      fracBelow(cs, bound) match {
        case Some(f) => if (below) f else 1.0 - f
        case None => (cs.lo, cs.hi) match {
          case (Some(lo), Some(hi)) if hi > lo =>
            val f = (if (below) bound - lo else hi - bound) / (hi - lo)
            math.min(1.0, math.max(0.0, f))
          case _ => 1.0
        }
      }
    e match {
      case And(a, b) => selectivity(a, st) * selectivity(b, st)
      case Or(a, b) => math.min(1.0, selectivity(a, st) + selectivity(b, st))
      case Not(a) => math.max(0.0, 1.0 - selectivity(a, st))
      case EqualTo(a, l) if colStats(a).isDefined && l.foldable =>
        1.0 / math.max(1L, colStats(a).get.ndv)
      case EqualTo(l, a) if colStats(a).isDefined && l.foldable =>
        1.0 / math.max(1L, colStats(a).get.ndv)
      case In(a, list) if colStats(a).isDefined && list.forall(_.foldable) =>
        math.min(1.0, list.length.toDouble / math.max(1L, colStats(a).get.ndv))
      case LessThan(a, l) => cmp(a, l, below = true, colStats, litD, rangeFrac)
      case LessThanOrEqual(a, l) => cmp(a, l, below = true, colStats, litD, rangeFrac)
      case GreaterThan(a, l) => cmp(a, l, below = false, colStats, litD, rangeFrac)
      case GreaterThanOrEqual(a, l) => cmp(a, l, below = false, colStats, litD, rangeFrac)
      case _ => 1.0
    }
  }

  private def cmp(
      a: Expression, l: Expression, below: Boolean,
      colStats: Expression => Option[StatsCbo.ColStats],
      litD: Expression => Option[Double],
      rangeFrac: (StatsCbo.ColStats, Double, Boolean) => Double): Double =
    (colStats(a), litD(l)) match {
      case (Some(cs), Some(b)) => rangeFrac(cs, b, below)
      // literal on the left flips the direction
      case _ => (colStats(l), litD(a)) match {
        case (Some(cs), Some(b)) => rangeFrac(cs, b, !below)
        case _ => 1.0
      }
    }
}
