package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY gate — per-rule violation counts computed
  * in-plan, the pre-load constraint check a warehouse ETL runs before
  * committing a batch (the reference pipeline loads whatever the job
  * produced; this is the missing guardrail, the K5 alert's
  * preventative twin).
  *
  * Rule classes: row-local predicates (not-null, range, accepted set)
  * all evaluate in ONE aggregate pass over the fact — a single scan,
  * map-side partials, no shuffle of the data itself; key uniqueness is
  * one groupBy on the key; referential integrity is one left-anti join
  * per dimension (broadcast when the dim is small — exactly the
  * reconciliation join shape). Everything returns counts, not rows, so
  * the gate's output is bounded at any scale; the violating-row SAMPLE
  * (for the alert body) is a separate bounded top-k the caller can run
  * on the one rule that fired.
  *
  * The verdict frame is (rule, violations) — deterministic, tiny, and
  * joins straight into [[Alerts]]-style conditional publishing or a
  * streaming per-batch gate ([[graft.streaming.StreamingOps
  * .dqGateStream]]).
  */
object DataQuality {

  sealed trait Rule { def name: String }

  /** Violation: the column is null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null:$col"
  }

  /** Violation: value outside [lo, hi] (nulls are NotNull's business). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"range:$col"
  }

  /** Violation: value outside the accepted set (nulls excluded). */
  final case class Accepted(col: String, values: Seq[String]) extends Rule {
    val name = s"accepted:$col"
  }

  /** Violation: one EXTRA row per duplicated key tuple (count − 1), so
    * zero means the key is unique.
    */
  final case class UniqueKey(cols: Seq[String]) extends Rule {
    val name = s"unique:${cols.mkString("+")}"
  }

  /** Violation: a non-null fact key with no match in the dimension —
    * standard SQL FK semantics (nulls pass).
    */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String) extends Rule {
    val name = s"fk:$col"
  }

  /** Evaluate all `rules` against `df`: one (rule, violations) row per
    * rule, ordered by rule name.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowRules = rules.collect {
      case r: NotNull => (r.name, col(r.col).isNull)
      case r: InRange => (r.name, col(r.col) < r.lo || col(r.col) > r.hi)
      case r: Accepted => (r.name,
        col(r.col).isNotNull && !col(r.col).isInCollection(r.values))
    }
    // One aggregate pass for every row-local rule.
    val rowFrame =
      if (rowRules.isEmpty) Nil
      else {
        val aggs = rowRules.map { case (n, pred) =>
          sum(when(pred, 1L).otherwise(0L)).as(n)
        }
        Seq(df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rowRules.map { case (n, _) =>
            struct(lit(n).as("rule"), coalesce(col(n), lit(0L)).as("violations"))
          }: _*)).as("kv"))
          .select(col("kv.rule"), col("kv.violations")))
      }
    val keyFrames = rules.collect { case r: UniqueKey =>
      df.groupBy(r.cols.map(col): _*).agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
        .select(lit(r.name).as("rule"), col("violations"))
    }
    val fkFrames = rules.collect { case r: ForeignKey =>
      df.select(col(r.col)).where(col(r.col).isNotNull)
        .join(r.dim.select(col(r.dimCol).as(r.col)), Seq(r.col), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(r.name).as("rule"), col("violations"))
    }
    (rowFrame ++ keyFrames ++ fkFrames)
      .reduce(_ unionByName _)
      .orderBy("rule")
  }

  /** True iff no rule fired — the load gate. */
  def passes(verdicts: DataFrame): Boolean =
    verdicts.where(col("violations") > 0).isEmpty

  /** IN-FLIGHT quality counters via Spark's Observation API — the
    * zero-cost sibling of [[check]]: rather than a second scan over the
    * fact, `observe` attaches the row-local rule aggregates to the
    * WRITE plan itself, so the counters accumulate on the executors
    * while the job's real action runs and surface on the driver when it
    * finishes. This is how a 100 TB load self-reports — [[check]] costs
    * a full extra pass at that scale; an observation costs nothing but
    * the per-row predicate.
    *
    * Returns the instrumented frame plus the [[org.apache.spark.sql
    * .Observation]] handle; after ANY action on the returned frame,
    * `obs.get` yields `Map(ruleName -> violationCount)`. Only row-local
    * rules apply (key-uniqueness and FK rules need their own shuffles
    * and stay in [[check]]).
    */
  def observed(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val rowRules = rules.collect {
      case r: NotNull => (r.name, col(r.col).isNull)
      case r: InRange => (r.name, col(r.col) < r.lo || col(r.col) > r.hi)
      case r: Accepted => (r.name,
        col(r.col).isNotNull && !col(r.col).isInCollection(r.values))
    }
    require(rowRules.nonEmpty, "observed() needs at least one row-local rule")
    require(rowRules.size == rules.size,
      "observed() accepts row-local rules only (NotNull/InRange/Accepted); " +
        "UniqueKey/ForeignKey need their own passes — use check()")
    val obs = org.apache.spark.sql.Observation("dq")
    // coalesce matches check()'s empty-input contract: a bare sum over
    // an empty micro-batch/load is NULL, and callers reading the
    // observation as Long would NPE.
    val aggs = rowRules.map { case (n, pred) =>
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(n)
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
