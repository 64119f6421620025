package graft.ext

/** Overlap INDEPENDENT Spark actions (guide §2.6): Spark's scheduler happily
  * runs several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. Two table writes
  * that read from the same already-materialized input and write to different
  * tables have no ordering constraint, so submitting them from two threads
  * lets the second job's tasks back-fill executors freed by the first job's
  * tail instead of idling through it.
  *
  * Only for actions with NO ordering contract between them — never for
  * crash-ordered append sequences (e.g. [[DedupIndex.commitIncrement]]'s
  * bands→shingles→sizes order IS its crash-safety contract).
  */
object Par {

  /** Run the thunks concurrently, wait for all, rethrow the first failure
    * (after every thread has finished — no torn half-running state).
    */
  def run(fs: (() => Unit)*): Unit = {
    if (fs.sizeIs <= 1) { fs.foreach(_()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = fs.map { f =>
      val t = new Thread(() => try f() catch { case e: Throwable => errs.add(e); () })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val e = errs.poll()
    if (e != null) throw e
  }
}
