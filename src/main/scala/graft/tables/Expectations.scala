package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS — the DLT-expectations /
  * Delta-CHECK-constraint surface of the reference platform, re-expressed
  * engine-side: declare named predicates over a frame, then in ONE pass
  *
  *   - [[annotate]] every row with its violated-rule names,
  *   - [[split]] into (clean, quarantined-with-reasons) — the
  *     expect_or_drop + quarantine pattern,
  *   - [[metrics]] per-rule violation counts — the numbers a pipeline
  *     health dashboard plots per run.
  *
  * Null semantics are EXPLICIT: a rule passes only when its predicate is
  * TRUE — a NULL predicate (e.g. a comparison against a NULL column) is a
  * violation, not a silent pass (`coalesce(pred, false)`); this is the
  * conservative reading a quality gate wants, and it is pinned in spec.
  *
  * Scale shape: all rules evaluate as one projected array expression
  * riding the scan (per-row map work, no shuffle); [[metrics]] is a
  * single 1-row aggregation with map-side partial sums. Quarantined rows
  * carry their reasons, so triage never re-runs the rules.
  */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  /** `_violations`: names of the rules this row violates (empty = clean). */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "declare at least one expectation")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name)}")
    requireSafeNames(rules)
    val marks = rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name)))
    df.withColumn("_violations",
      filter(array(marks: _*), v => v.isNotNull))
  }

  /** (clean rows — `_violations` dropped, quarantined rows — reasons kept). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.filter(size(col("_violations")) === 0).drop("_violations"),
      a.filter(size(col("_violations")) > 0))
  }

  /** Per-rule violation metrics: (rule, n_rows, n_viol, viol_frac), in
    * declaration order.
    */
  // rule names reach a selectExpr literal — restrict to identifier chars
  // so a name can never smuggle SQL
  private def requireSafeNames(rules: Seq[Rule]): Unit =
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name must be [A-Za-z0-9_]+: '${r.name}'"))

  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "declare at least one expectation")
    requireSafeNames(rules)
    val aggs = count(lit(1)).cast("long").as("_n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum((!coalesce(r.predicate, lit(false))).cast("long")).cast("long").as(s"_v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex
      .map { case (r, i) => s"${i}, '${r.name}', _v$i" }
      .mkString(", ")
    one.selectExpr(
        s"stack(${rules.size}, $stacked) AS (rule_idx, rule, n_viol)", "_n")
      .select(col("rule_idx").cast("int").as("rule_idx"), col("rule"),
        col("_n").as("n_rows"), col("n_viol"),
        (col("n_viol").cast("double") /
          greatest(col("_n"), lit(1L)).cast("double")).as("viol_frac"))
      .orderBy(col("rule_idx"))
  }
}
