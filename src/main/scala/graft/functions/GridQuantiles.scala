package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-error quantiles at ARBITRARY percentages from a fixed-grid
  * counting histogram — the sketch companion to the exact `percentile`
  * path (f8), which buffers every group value in the aggregation buffer
  * and is documented to OOM on a skewed group at corpus scale.
  *
  * Shape: one map-side-combinable count per (group, bin) — per-group state
  * is the histogram (range/width bins), NOT the values — then one window
  * pass over the tiny histogram for cumulative counts, then `min(bin)`
  * where the cumulative count reaches the target rank. Everything is
  * integer arithmetic except two IEEE-deterministic steps (`floor(x/w)`
  * binning and `ceil(p·n)` rank targeting), so results replay bit-for-bit
  * in any engine — no interpolation, which is what breaks cross-engine
  * parity for non-dyadic percentages in the exact path
  * (FuncQueries.scala f8).
  *
  * The estimate for percentage p is the LOWER EDGE of the bin holding the
  * ⌈p·n⌉-th order statistic: estimate ∈ (orderstat − width, orderstat] —
  * error strictly bounded by the grid width on the value axis
  * (GridQuantilesSpec pins the bound against in-test exact order
  * statistics). Choose width from the value range and the error you can
  * accept; bins are sparse (only populated cells exist), so a wide range
  * with clustered values stays cheap.
  */
object GridQuantiles {

  /** Per-group grid quantiles. `ps` maps output column name → percentage
    * in (0, 1]. Output: groupCol, one long column per entry of `ps` (the
    * bin lower edge), and `n` (group count).
    */
  def gridQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      width: Long, ps: Seq[(String, Double)]): DataFrame = {
    require(width >= 1, s"grid width must be >= 1, got $width")
    ps.foreach { case (nm, p) =>
      require(p > 0.0 && p <= 1.0, s"percentage $nm must be in (0,1], got $p")
    }
    val hist = df
      .groupBy(col(groupCol), floor(col(valueCol) / lit(width.toDouble)).as("_bin"))
      .agg(count(lit(1)).as("_cnt"))
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("_cum", sum(col("_cnt")).over(byGroup.orderBy(col("_bin"))))
      .withColumn("_n", sum(col("_cnt")).over(byGroup))
    val qCols: Seq[Column] = ps.map { case (nm, p) =>
      // rank target ⌈p·n⌉: one IEEE multiply + ceil, identical in any
      // engine; the first bin whose cumulative count reaches it holds the
      // order statistic
      min(when(col("_cum") >= ceil(lit(p) * col("_n")), col("_bin")))
        .*(lit(width)).cast("long").as(nm)
    }
    cum.groupBy(col(groupCol))
      .agg(qCols.head, qCols.tail :+ max(col("_n")).as("n"): _*)
  }
}
