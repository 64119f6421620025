package graft.tables

import org.apache.spark.sql.SparkSession

/** Shared-filesystem scratch space for intermediate stage tables.
  *
  * Multi-pass queries (e.g. c1_curation's thrice-referenced filtered corpus)
  * materialize intermediates through here instead of a driver-local temp dir:
  * `java.nio.file.Files.createTempDirectory` resolves to `file:/tmp/...`,
  * which on a real cluster means every executor writes its shards to its own
  * local disk and the read-back sees only the driver-local fragment. The
  * scratch root must be a filesystem all executors share.
  *
  * Resolution order:
  *   1. `graft.scratch.dir` (runtime conf) — set this on a cluster
  *   2. `spark.sql.warehouse.dir`/_graft_scratch — the warehouse is a
  *      shared path in any properly configured deployment, and local runs
  *      get a working default with zero configuration
  *
  * Stage tables use fixed names and [[TableStore.overwrite]]'s atomic swap,
  * so repeated invocations (bench loops) reuse one directory instead of
  * leaking a parquet copy per run. Call [[cleanup]] after the final action
  * on any DataFrame still reading a stage table.
  */
object Scratch {

  private val ScratchSubdir = "_graft_scratch"

  def root(spark: SparkSession): String =
    spark.conf.getOption("graft.scratch.dir")
      .getOrElse(s"${spark.conf.get("spark.sql.warehouse.dir")}/$ScratchSubdir")

  def store(spark: SparkSession): TableStore = new TableStore(spark, root(spark))

  /** Drop every stage table under the scratch root (driver-side FS call). */
  def cleanup(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(root(spark))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }
}
