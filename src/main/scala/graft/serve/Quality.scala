package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality probes — the reference's documented acceptance checks
  * (README.md:257-266: duplicate detection, schema/key-type alignment,
  * join coverage) as reusable library calls instead of ad-hoc notebook
  * cells (SURVEY.md §5).
  */
object Quality {

  /** Duplicate-key report: keys with >1 row (1_customer_data_processing
    * .py:69 probe, generalized to composite keys).
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Join coverage: how many fact rows find a dim partner, and the top
    * missing keys. The reference's fact→dim_customers / dim_products /
    * (product_code, year) checks (README.md:257-266).
    */
  def joinCoverage(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame = {
    // single aggregation over one left join against the DISTINCT dim keys
    // (distinct keeps the join row-preserving on the fact side) — one job
    // when the caller acts on it, instead of two driver-side count() jobs;
    // nothing is collected here at all
    val hit = dim.select(keys.map(col): _*).distinct().withColumn("_gm_hit", lit(1))
    fact.join(hit, keys, "left")
      .agg(count(lit(1)).as("fact_rows"), count(col("_gm_hit")).as("matched"))
      .select(col("fact_rows"), col("matched"),
        (col("fact_rows") - col("matched")).as("missing"),
        when(col("fact_rows") === 0, lit(1.0))
          .otherwise(col("matched").cast("double") / col("fact_rows").cast("double"))
          .as("coverage"))
  }

  /** The fact rows that would be dropped/nulled by a dim join — top
    * offenders by frequency (actionable form of the missing-key probe).
    */
  def missingKeys(fact: DataFrame, dim: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    fact.join(dim.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(keys.head))
      .limit(topN)

  /** Column null-rate profile — cheap schema-drift tripwire. One lazy
    * aggregation (row count included), no eager driver count().
    */
  def nullRates(df: DataFrame): DataFrame = {
    val nullCounts = df.columns.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_gm_null_$c"))
    df.agg(count(lit(1)).as("_gm_n"), nullCounts.toSeq: _*)
      .select(df.columns.map(c =>
        (col(s"_gm_null_$c") / greatest(col("_gm_n"), lit(1)).cast("double")).as(c)).toSeq: _*)
  }
}
