package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval scoring (Robertson-Spärck Jones) with a RATIONAL
  * idf: the classic `ln((N-df+0.5)/(df+0.5))` is replaced by the odds ratio
  * itself — `ln` is monotone per term, but inside the cross-term SUM it is
  * a libm transcendental whose final ulp differs across engines, which the
  * cross-engine determinism contract forbids (see t5's idf, same choice).
  * Rankings shift slightly vs log-BM25 (rare terms weigh relatively more);
  * for a dedup/retrieval pre-filter that trade is standard and the scoring
  * stays bit-replayable.
  *
  * Scale shape: the term explode is filtered to the query vocabulary
  * IMMEDIATELY (a tiny isin on the generator output — only query-term
  * postings survive the explode), document length comes from a per-row
  * `size()` with no explode at all, and N/avgdl fold in as a broadcast
  * 1-row aggregate. Per-term scores pivot to FIXED columns so the final
  * sum runs in query-term order — deterministic doubles, no aggregation-
  * order drift.
  */
object Bm25 {

  def score(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: need at least one query term")
    require(queryTerms.distinct == queryTerms, "bm25: duplicate query terms")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val lens = docs.select(col(idCol), size(toks).cast("double").as("dlen"))
    val stats = lens.agg(count(lit(1)).cast("double").as("_n"),
      (sum(col("dlen")) / count(lit(1))).as("_avgdl"))
    val postings = docs
      .select(col(idCol), explode(toks).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).cast("double").as("tcnt"))
    val df_ = postings.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val scored = postings
      .join(broadcast(df_), Seq("term"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("idf", (col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("tscore",
        col("idf") * ((col("tcnt") * lit(k1 + 1.0)) /
          (col("tcnt") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dlen") / col("_avgdl")))))
    // positional conditional aggregation, NOT pivot: pivot turns raw query
    // terms into column names, and a term containing '.'/backticks — or one
    // equal to idCol — breaks resolution downstream. `_t$i` aliases are
    // collision-free by construction; the fixed index order doubles as the
    // deterministic summation order.
    val wide = scored.groupBy(col(idCol))
      .agg(
        max(when(col("term") === queryTerms.head, col("tscore"))).as("_t0"),
        queryTerms.zipWithIndex.tail.map { case (t, i) =>
          max(when(col("term") === t, col("tscore"))).as(s"_t$i")
        }: _*)
    val total = queryTerms.indices.map(i => coalesce(col(s"_t$i"), lit(0.0))).reduce(_ + _)
    // parallel top-k (TakeOrderedAndProject), never a global one-task
    // window over every matched doc; the rank window then sees k rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col(idCol))
    wide.select(col(idCol), total.as("score"))
      .orderBy(col("score").desc, col(idCol)).limit(topK)
      .withColumn("rnk", row_number().over(w))
  }
}
