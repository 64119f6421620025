package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed managed tables — the CO-LOCATED JOIN lever for repeatedly-joined
  * big×big keys (fact⋈fact, events⋈events, doc-pairs⋈docs): pay the key
  * shuffle ONCE at write time, then every equi-join or aggregation on the
  * bucket key reads pre-partitioned buckets and plans with ZERO exchange on
  * the bucketed side(s). At 100 TB the repeated-shuffle tax is the single
  * biggest avoidable cost of a star-join/sessionization workload — two
  * co-bucketed tables (same columns, same count) sort-merge join with no
  * network movement at all.
  *
  * This intentionally uses Spark's catalog-managed bucketing
  * (`bucketBy(n).sortBy(n).saveAsTable`) rather than [[TableStore]]'s
  * path-based parquet: bucket metadata lives in the catalog, which is what
  * lets the planner trust `HashPartitioning(bucketCols, n)` on read.
  * [[DedupIndex]]'s `idBuckets` layout is the OTHER bucketing (hive
  * partition dirs for partition PRUNING); this one is for exchange
  * elimination.
  *
  * The frame is `repartition(n, bucketCols)` FIRST — Spark's `repartition`
  * and `bucketBy` share the Murmur3 hash, so each write task holds exactly
  * one bucket's rows and each bucket lands as ONE file: with one file per
  * bucket the planner can also trust the per-bucket SORT order and drop the
  * join's sort stages, and a later read never faces the
  * many-small-files-per-bucket degeneration.
  *
  * Caveats, documented not hidden: `saveAsTable(Overwrite)` cannot
  * overwrite a table that feeds its own input plan (same Spark limitation
  * [[TableStore]] works around for path tables — stage to a new table when
  * self-reading); exchange-free planning requires BOTH sides bucketed
  * on the join keys with the SAME bucket count (a mismatched count
  * re-shuffles the smaller side only — still half the win); and one file
  * per bucket means `nBuckets` is ALSO the file-size dial — a bucket file
  * is table_size / nBuckets, so size the count for BOTH join parallelism
  * and a sane file size (hundreds of MB): a 10 TB table at 64 buckets
  * would write 160 GB files. When the right join count would still leave
  * files too large, pass `maxRecordsPerFile` to split bucket files at a
  * row bound — the bucket hash layout (exchange elimination) survives,
  * but the planner only trusts the per-bucket SORT when each bucket is
  * one file, so joins re-add their sort stages: trade sort CPU for
  * manageable files, never the shuffle.
  */
object Buckets {

  /** Write `df` as a bucketed+sorted managed parquet table (overwrite).
    * `maxRecordsPerFile` > 0 splits each bucket's output at that row count
    * (see the file-size caveat above); 0 keeps the one-file-per-bucket
    * layout that lets the planner drop join sorts too.
    */
  def overwriteBucketed(table: String, df: DataFrame,
      bucketCols: Seq[String], nBuckets: Int,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(maxRecordsPerFile >= 0, s"maxRecordsPerFile must be >= 0")
    val w = df.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite").format("parquet")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table (bucket metadata rides the catalog). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** DROP the managed table (data + catalog entry). */
  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
