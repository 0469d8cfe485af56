package graft.profile

import graft.profile.ColumnProfiler.{ColumnProfile, TableProfile}

/** Profile comparison with tolerances (SURVEY §2.11 C3/C4; reference
  * /root/reference/parq_tools/utils/profile_compare_utils.py:48-166 — ported
  * semantics, engine-independent Scala):
  *
  *   - statuses: equal | different | missing_in_some | type_mismatch
  *   - per-metric deltas vs the FIRST dataset: abs and rel; rel = 0 when both
  *     deltas are 0, ∞ when baseline is 0 and delta ≠ 0
  *     (profile_compare_utils.py:80)
  *   - tolerance check: diff <= max(abs_tol, rel_tol * max(|a|,|b|));
  *     NaN == NaN is within tolerance (profile_compare_utils.py:48-61)
  */
object ProfileComparison {

  val DefaultMetrics: Seq[String] =
    Seq("mean", "std", "min", "max", "n_missing", "p_missing", "n_distinct")

  final case class MetricComparison(
      values: Seq[Option[Any]],
      withinTolerance: Boolean,
      deltasFromFirst: Seq[Option[(Double, Double)]]) // (abs, rel)

  final case class ColumnComparison(
      present: Seq[Boolean],
      types: Seq[Option[String]],
      status: String,
      metrics: Map[String, MetricComparison],
      reasons: Seq[String])

  final case class Overview(
      equal: Int, different: Int, missingInSome: Int, typeMismatch: Int, totalColumns: Int)

  final case class ComparisonSummary(
      labels: Seq[String],
      overview: Overview,
      columns: Map[String, ColumnComparison],
      absTol: Double,
      relTol: Double,
      metricsCompared: Seq[String]) {
    def changedColumns: Seq[String] =
      columns.collect { case (c, cc) if cc.status != "equal" => c }.toSeq.sorted
  }

  private def metricValue(p: ColumnProfile, metric: String): Option[Any] = metric match {
    case "mean"       => p.mean
    case "std"        => p.std
    case "min"        => p.min
    case "max"        => p.max
    case "n_missing"  => Some(p.nMissing)
    case "p_missing"  => Some(p.pMissing)
    case "n_distinct" => Some(p.nDistinct)
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  private def asDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case _: Boolean => None // bools are not numeric (reference is_numeric)
    case _ => None
  }

  private[graft] def withinTolerance(a: Option[Any], b: Option[Any],
      absTol: Double, relTol: Double): Boolean = (a, b) match {
    case (Some(x), Some(y)) =>
      (asDouble(x), asDouble(y)) match {
        case (Some(da), Some(db)) =>
          if (da.isNaN && db.isNaN) true
          else if (da.isNaN || db.isNaN) false
          else {
            val diff = math.abs(da - db)
            val scale = math.max(math.abs(da), math.abs(db))
            diff <= math.max(absTol, relTol * scale)
          }
        case _ => x == y
      }
    case (None, None) => true
    case _ => false
  }

  private def columnSummary(values: Seq[Option[Any]], absTol: Double, relTol: Double)
      : MetricComparison = {
    if (values.isEmpty) return MetricComparison(Nil, withinTolerance = true, Nil)
    val baseline = values.head
    var allWithin = true
    val deltas = None +: values.tail.map { v =>
      val delta = (baseline.flatMap(asDouble), v.flatMap(asDouble)) match {
        case (Some(b0), Some(v0)) if !b0.isNaN && !v0.isNaN =>
          val abs = math.abs(v0 - b0)
          val rel =
            if (b0 != 0) abs / math.abs(b0)
            else if (abs == 0) 0.0
            else Double.PositiveInfinity
          Some((abs, rel))
        case _ => None
      }
      if (!withinTolerance(baseline, v, absTol, relTol)) allWithin = false
      delta
    }
    MetricComparison(values, allWithin, deltas)
  }

  def compare(
      profiles: Seq[TableProfile],
      labels: Seq[String],
      absTol: Double = 0.0,
      relTol: Double = 0.0,
      metrics: Seq[String] = DefaultMetrics): ComparisonSummary = {
    require(profiles.size >= 2, "need at least two profiles to compare")
    require(profiles.size == labels.size, "labels must match profiles")

    // Column order: first-seen across datasets (reference :102-107).
    val allColumns = profiles.foldLeft(Vector.empty[String]) { (acc, p) =>
      acc ++ p.variables.keys.toSeq.filterNot(acc.contains)
    }

    var eq, diff, missing, mismatch = 0
    val columns = allColumns.map { column =>
      val entries = profiles.map(_.variables.get(column))
      val present = entries.map(_.isDefined)
      val types = entries.map(_.map(_.dtype))
      var status = "equal"
      val reasons = Vector.newBuilder[String]

      if (!present.forall(identity)) {
        status = "missing_in_some"; reasons += "missing_in_some_datasets"
      } else if (types.flatten.distinct.size > 1) {
        status = "type_mismatch"; reasons += "type_mismatch"
      }

      var metricPayload = Map.empty[String, MetricComparison]
      if (status == "equal") {
        val diffs = Vector.newBuilder[String]
        metrics.foreach { m =>
          val values = entries.map(_.flatMap(metricValue(_, m)))
          val cmp = columnSummary(values, absTol, relTol)
          metricPayload += m -> cmp
          if (!cmp.withinTolerance) diffs += m
        }
        val d = diffs.result()
        if (d.nonEmpty) { status = "different"; reasons += s"metric_differences:${d.mkString(",")}" }
      }

      status match {
        case "equal" => eq += 1
        case "different" => diff += 1
        case "missing_in_some" => missing += 1
        case "type_mismatch" => mismatch += 1
      }
      column -> ColumnComparison(present, types, status, metricPayload, reasons.result())
    }.toMap

    ComparisonSummary(labels,
      Overview(eq, diff, missing, mismatch, allColumns.size),
      columns, absTol, relTol, metrics)
  }

  /** Diff-only view (SURVEY §2.11 C4; reference parq_profile.py:321-367 +
    * profile_compare_utils.py:231-252): prune to changed columns, recompute
    * the overview over the pruned set, keep tolerance settings. */
  def diffOnly(s: ComparisonSummary): ComparisonSummary = {
    val changed = s.columns.filter { case (_, cc) => cc.status != "equal" }
    ComparisonSummary(
      labels = s.labels,
      overview = Overview(
        equal = 0,
        different = changed.values.count(_.status == "different"),
        missingInSome = changed.values.count(_.status == "missing_in_some"),
        typeMismatch = changed.values.count(_.status == "type_mismatch"),
        totalColumns = changed.size),
      columns = changed,
      absTol = s.absTol, relTol = s.relTol, metricsCompared = s.metricsCompared)
  }

  /** Human-readable diff report with status prefixes (🟢 equal / 🔴 changed)
    * and a tolerance footer — the reference's text rendering shape. */
  def renderReport(s: ComparisonSummary, diffsOnly: Boolean = false): String = {
    val view = if (diffsOnly) diffOnly(s) else s
    val sb = new StringBuilder
    sb.append(s"Profile comparison: ${view.labels.mkString(" vs ")}\n")
    sb.append(s"columns: ${view.overview.totalColumns}  equal: ${view.overview.equal}  " +
      s"different: ${view.overview.different}  missing: ${view.overview.missingInSome}  " +
      s"type-mismatch: ${view.overview.typeMismatch}\n")
    view.columns.toSeq.sortBy(_._1).foreach { case (name, cc) =>
      val prefix = if (cc.status == "equal") "🟢" else "🔴"
      sb.append(s"$prefix $name [${cc.status}]")
      if (cc.reasons.nonEmpty) sb.append(s" ${cc.reasons.mkString("; ")}")
      sb.append('\n')
    }
    sb.append(s"tolerances: abs_tol=${view.absTol} rel_tol=${view.relTol}\n")
    sb.toString
  }

  /** JSON export of the summary (reference parq_profile.py:289-319 JSON path).
    * NaN → null, ±∞ → "inf"/"-inf" (normalize_for_export,
    * profile_compare_utils.py:28-40). */
  def toJson(s: ComparisonSummary): String = {
    def jStr(x: String) = "\"" + x.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def jNum(d: Double): String =
      if (d.isNaN) "null"
      else if (d.isPosInfinity) "\"inf\""
      else if (d.isNegInfinity) "\"-inf\""
      else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def jAny(v: Any): String = v match {
      case null => "null"
      case d: Double => jNum(d)
      case f: Float => jNum(f.toDouble)
      case n: Number => n.toString
      case b: Boolean => b.toString
      case ts: java.sql.Timestamp => jStr(ts.toString)
      case other => jStr(other.toString)
    }
    def jOpt(v: Option[Any]): String = v.map(jAny).getOrElse("null")

    val cols = s.columns.toSeq.sortBy(_._1).map { case (name, cc) =>
      val metrics = cc.metrics.toSeq.sortBy(_._1).map { case (m, mc) =>
        val deltas = mc.deltasFromFirst.map {
          case Some((a, r)) => s"""{"abs":${jNum(a)},"rel":${jNum(r)}}"""
          case None => "null"
        }.mkString("[", ",", "]")
        s"""${jStr(m)}:{"values":${mc.values.map(jOpt).mkString("[", ",", "]")},"within_tolerance":${mc.withinTolerance},"deltas_from_first":$deltas}"""
      }.mkString("{", ",", "}")
      s"""${jStr(name)}:{"present":${cc.present.mkString("[", ",", "]")},"types":${cc.types.map(t => t.map(jStr).getOrElse("null")).mkString("[", ",", "]")},"status":${jStr(cc.status)},"metrics":$metrics,"reasons":${cc.reasons.map(jStr).mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")

    s"""{"labels":${s.labels.map(jStr).mkString("[", ",", "]")},"overview":{"equal":${s.overview.equal},"different":${s.overview.different},"missing_in_some":${s.overview.missingInSome},"type_mismatch":${s.overview.typeMismatch},"total_columns":${s.overview.totalColumns}},"columns":$cols,"tolerance":{"abs_tol":${s.absTol},"rel_tol":${s.relTol}},"metrics_compared":${s.metricsCompared.map(jStr).mkString("[", ",", "]")}}"""
  }
}
