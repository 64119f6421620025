package graft.queries

/** All declared queries. SparkEntry derives `queries`/`oracleSql` from here;
  * Bench runs the subset with `benchmark = true`.
  */
object Registry {
  def defs: Seq[QueryDef] =
    CoreQueries.all ++ FuncQueries.all ++ JoinQueries.all ++ MergeQueries.all ++
      ServeQueries.all ++ ExtQueries.all

  def queryMap: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracleMap: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap

  /** Headline subset timed by Bench (benchmark=false marks correctness-only
    * baselines, e.g. the all-pairs cosine dedup).
    */
  def benchMap: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    defs.filter(_.benchmark).map(d => d.name -> d.fn).toMap
}
