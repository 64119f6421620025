package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * AQE's skew-join splitting (on by default here) handles most runtime skew;
  * salting is the explicit tool for the pathological cases AQE can't fix —
  * a single hot key bigger than an executor, or skewed aggregation where
  * the hot key's partial aggregate still lands on one reducer.
  *
  * Salted equi-join: the skewed (large) side gets a random salt in
  * [0, factor); the compact side is EXPLODED `factor`× with every salt
  * value, so `(key, salt)` still matches. Hot-key work fans out across
  * `factor` reducers at the cost of replicating the compact side — which is
  * why the compact side should be the smaller one (but too big to
  * broadcast, else just broadcast).
  */
object Skew {

  private val SaltCol = "_gm_salt"

  /** Equi-join `skewed ⋈ compact` on `keys`, fanning each hot key across
    * `factor` reducers. Join type limited to inner/left on the skewed side
    * (the salt replication makes right/full semantics ambiguous).
    */
  def saltedJoin(
      skewed: DataFrame, compact: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    val salted = skewed.withColumn(SaltCol, (rand(42) * factor).cast("int"))
    val replicated = compact.withColumn(SaltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (keys, salt),
    * then final aggregate on keys. `partial` computes the salted partials
    * from raw rows; `merge` combines partials (classic sum/sum, count/sum,
    * min/min algebra — caller supplies both sides of the monoid).
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], factor: Int)(
      partial: Seq[(Column, String)], merge: String => Column): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    val salted = df.withColumn(SaltCol, pmod(spark_partition_id(), lit(factor)))
    val partialAggd = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    partialAggd
      .groupBy(keys.map(col): _*)
      .agg(merge(partial.head._2).as(partial.head._2),
        partial.tail.map { case (_, n) => merge(n).as(n) }: _*)
  }
}
