package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic per-column table profile — the "what did we just ingest" pass a
  * pipeline runs on every new drop before trusting it: row count, non-null
  * count, and exact distinct count per column, in long format so the output
  * schema is table-independent.
  *
  * Scale note: the exact multi-column `countDistinct` plans ONE pass with
  * an Expand (input × |columns| before partial aggregation) — the right
  * shape up to wide-but-bounded profiles. At 100 TB swap the distinct
  * column for `approx_count_distinct` (HLL, no Expand blow-up) or the x1
  * md5-register sketch; the exact form here is the oracle-checkable gate
  * the approximations are validated against.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile: need at least one column")
    val unknown = columns.filterNot(df.columns.contains)
    require(unknown.isEmpty, s"profile: unknown columns ${unknown.mkString(", ")}")
    val aggs = columns.flatMap(c => Seq(
      count(col(c)).cast("long").as(s"__nn_$c"),
      countDistinct(col(c)).cast("long").as(s"__nd_$c")))
    val wide = df.agg(count(lit(1)).cast("long").as("__n"), aggs: _*)
    val entries = columns.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      col(s"__nn_$c").as("n_nonnull"),
      (col("__n") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
