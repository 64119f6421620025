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
  * Concurrency: the root is namespaced by Spark application id (two driver
  * processes sharing one warehouse never collide), and per-invocation stage
  * names from [[stageName]] carry a process-wide generation counter (two
  * interleaved runs of the same query in one session never clobber each
  * other — no wall clock involved, so replays stay deterministic).
  * [[gc]] bounds the leak: generations more than `keepLast` behind the
  * counter are dropped at the next invocation; [[cleanup]] (run after the
  * final action of a bench/verify pass) removes this app's whole scratch.
  */
object Scratch {

  private val ScratchSubdir = "_graft_scratch"
  // per-base generation counters: gc's keepLast bound then counts
  // invocations of the SAME stage family, not unrelated stage activity
  private val gens =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def gen(base: String) =
    gens.computeIfAbsent(base, _ => new java.util.concurrent.atomic.AtomicLong(0))

  def root(spark: SparkSession): String =
    spark.conf.getOption("graft.scratch.dir")
      .getOrElse(s"${spark.conf.get("spark.sql.warehouse.dir")}/$ScratchSubdir") +
      "/" + spark.sparkContext.applicationId

  def store(spark: SparkSession): TableStore = new TableStore(spark, root(spark))

  /** Unique per-invocation stage-table name: `<base>_g<n>` with a
    * monotonically increasing in-process generation.
    */
  def stageName(base: String): String = s"${base}_g${gen(base).incrementAndGet()}"

  /** Materialize `df` as a fresh generation of stage family `base` and
    * return a reader over it: one write, then every downstream reference
    * scans columnar parquet instead of re-evaluating the producing plan —
    * and the stage is a hard optimizer barrier (no predicate-pushdown
    * substitution of big projected expressions into filters). Optionally
    * hive-partitioned for downstream partition pruning.
    */
  def stage(df: org.apache.spark.sql.DataFrame, base: String,
      partitionBy: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val s = store(spark)
    val name = stageName(base)
    s.overwrite(name, df, partitionBy)
    gc(spark, base)
    s.read(name)
  }

  /** Drop stale generations of `base`: anything more than `keepLast`
    * behind the current counter. `keepLast` is the concurrency bound — a
    * stage is safe to read as long as fewer than `keepLast` newer
    * invocations of the SAME family started since it was written. 16
    * accommodates wide fan-outs of lazily-consumed results (e.g. building
    * many dedup DataFrames before executing any) while still bounding the
    * on-disk footprint.
    */
  def gc(spark: SparkSession, base: String, keepLast: Int = 16): Unit = {
    val current = gen(base).get()
    val p = new org.apache.hadoop.fs.Path(root(spark))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val pat = s"${java.util.regex.Pattern.quote(base)}_g(\\d+)".r
      fs.listStatus(p).foreach { st =>
        st.getPath.getName match {
          case pat(n) if n.toLong <= current - keepLast =>
            fs.delete(st.getPath, true); ()
          case _ => ()
        }
      }
    }
  }

  /** Drop this application's entire scratch tree, and opportunistically
    * reclaim sibling app directories idle for over an hour — crashed or
    * test-suite JVMs never reach their own cleanup, and nothing else can
    * ever delete a dead app's namespace. The idle threshold is generous:
    * any live app touches its stages far more often. (Wall-clock here is
    * housekeeping only — never in a query path, so determinism/replay are
    * unaffected.)
    */
  def cleanup(spark: SparkSession): Unit = {
    val mine = new org.apache.hadoop.fs.Path(root(spark))
    val fs = mine.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(mine, true)
    val parent = mine.getParent
    if (parent != null && fs.exists(parent)) {
      val idleMs = 60L * 60 * 1000
      val now = System.currentTimeMillis()
      fs.listStatus(parent)
        .filter(st => st.isDirectory && now - st.getModificationTime > idleMs)
        .foreach { st => fs.delete(st.getPath, true); () }
    }
  }
}
