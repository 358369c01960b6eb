package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}

/** The pluggable PUBLISH step of a commit — the single operation in
  * [[TxLog]]'s protocol (and [[graft.operators.ArtifactLock]]'s
  * acquisition) that must be atomic ACROSS PROCESSES: land a named
  * object exactly once, with every losing racer told loudly that it
  * lost.
  *
  * Why a seam: the engine's transactional story so far rested on the
  * filesystem — rename refusing an existing destination (HDFS, ABFS),
  * create-exclusive being kernel-atomic (local mounts), an in-JVM
  * lock for threaded writers. That contract holds nowhere a 100 TB
  * lake actually lives: plain object stores historically offered
  * neither, which is why Delta needs an external LogStore coordinator
  * there. S3-class stores now expose CONDITIONAL WRITES
  * (`If-None-Match: *` — the PUT succeeds only if the key does not
  * exist, HTTP 412 otherwise; S3A surfaces it through
  * `create(path, overwrite = false)` when conditional create is
  * enabled), which is exactly the one-winner primitive the commit
  * needs. The arbiter abstracts that primitive so the SAME commit
  * protocol is exact on every deployment class:
  *
  *  - [[RenameCommitArbiter]] (default, `rename`): temp write +
  *    exists-check + rename, in-JVM guard for threaded racers — exact
  *    cross-process where rename refuses an existing destination
  *    (HDFS/ABFS); dev-filesystem posture otherwise.
  *  - [[CreateExclusiveCommitArbiter]] (`conditional`): ONE
  *    create-exclusive write of the final object, no temp, no rename —
  *    exact wherever create(overwrite=false) is atomic: HDFS, local
  *    kernel mounts, and S3-class stores in conditional-write mode,
  *    where the close() PUT carries If-None-Match and a 412 loses the
  *    race. The object-store deployment posture.
  *  - [[InMemoryCasArbiter]] (`memory:<namespace>`): compare-and-swap
  *    in a process-local map — the fault-injection target for the
  *    contract spec, and the template for plugging an external
  *    coordinator (a DynamoDB/ZooKeeper-style arbiter implements the
  *    same two methods).
  *  - any fully-qualified class name with a no-arg constructor.
  *
  * Selected per session via `graft.txlog.commitArbiter`; resolution
  * happens at each publish, so a session can scope an arbiter around
  * one pipeline. */
trait CommitArbiter {

  /** Land `bytes` at `dst` iff nothing is there. True iff THIS call
    * created the object; false iff the destination already existed or
    * another racer won — of any set of concurrent callers, AT MOST ONE
    * may see true. Environmental failures (permissions, quota, torn
    * connections) must THROW, never return false: a false means
    * "someone else committed", and callers act on that. */
  def putIfAbsent(fs: FileSystem, dst: Path, bytes: Array[Byte]): Boolean

  /** Best-effort removal of a published object (vacuum/cleanup lanes —
    * never part of the win/lose decision). */
  def delete(fs: FileSystem, dst: Path): Unit = fs.delete(dst, false)
}

object CommitArbiter {
  val Conf = "graft.txlog.commitArbiter"

  /** The arbiter the session elected (default: rename). */
  def resolve(spark: org.apache.spark.sql.SparkSession): CommitArbiter =
    spark.conf.getOption(Conf).getOrElse("rename") match {
      case "rename" => RenameCommitArbiter
      case "conditional" | "create" => CreateExclusiveCommitArbiter
      case m if m.startsWith("memory:") =>
        InMemoryCasArbiter.namespace(m.stripPrefix("memory:"))
      case fqcn => Class.forName(fqcn).getDeclaredConstructor()
        .newInstance().asInstanceOf[CommitArbiter]
    }

  // threaded racers in ONE JVM serialize per destination — LocalFileSystem's
  // create-exclusive is check-then-create and exists+rename is two calls,
  // so without this two threads of one process could both win on a dev
  // filesystem (the Delta LogStore contract: a JVM lock locally, the
  // store's own atomicity across processes)
  private val guards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[storage] def guard(dst: Path): Object =
    guards.computeIfAbsent(dst.toString, _ => new Object)
}

/** Temp write + exists + rename — exact cross-process where rename
  * refuses an existing destination (HDFS, ABFS). The pre-r18 protocol,
  * unchanged, behind the seam. */
object RenameCommitArbiter extends CommitArbiter {
  override def putIfAbsent(fs: FileSystem, dst: Path,
                           bytes: Array[Byte]): Boolean = {
    val tmp = new Path(dst.getParent,
      s".${dst.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    val won = CommitArbiter.guard(dst).synchronized {
      !fs.exists(dst) && fs.rename(tmp, dst)
    }
    if (!won) fs.delete(tmp, false)
    won
  }
}

/** ONE create-exclusive write of the final object — the conditional-put
  * protocol. No temp file and no rename: on S3-class stores in
  * conditional-write mode the close() PUT carries `If-None-Match: *`
  * and exactly one concurrent writer's PUT lands (the rest see 412 →
  * lose); on HDFS/local the create itself refuses an existing path.
  * A failure AFTER winning create (torn write) deletes the partial
  * object and rethrows — it must surface as an error, never as a
  * quiet loss another writer could then overwrite. */
object CreateExclusiveCommitArbiter extends CommitArbiter {
  override def putIfAbsent(fs: FileSystem, dst: Path,
                           bytes: Array[Byte]): Boolean =
    CommitArbiter.guard(dst).synchronized {
      val created =
        try Some(fs.create(dst, false))
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case e: java.io.IOException if fs.exists(dst) => None
          case e: java.io.IOException => throw e
        }
      created match {
        case None => false
        case Some(out) =>
          try { out.write(bytes); out.close(); true }
          catch {
            case e: java.io.IOException =>
              // a conditional-put store arbitrates at CLOSE (the PUT is
              // the upload), so an exception here is EITHER a lost race
              // (the winner's complete object is at dst) or our own
              // torn write (a PREFIX of our bytes, possibly empty, is
              // at dst — on create-exclusive filesystems nobody else
              // can have written there after our create won). The
              // on-disk content disambiguates; a length check cannot
              // (two commits of one version are near-same-sized JSON)
              try out.close() catch { case _: java.io.IOException => () }
              val onDisk =
                try {
                  val in = fs.open(dst)
                  try Some(in.readAllBytes()) finally in.close()
                } catch { case _: java.io.IOException => None }
              onDisk match {
                case Some(b) if java.util.Arrays.equals(b, bytes) =>
                  true // landed in full despite the late error
                case Some(b) if b.length < bytes.length &&
                    java.util.Arrays.equals(
                      b, java.util.Arrays.copyOf(bytes, b.length)) =>
                  // OUR torn partial — sweep it and surface the failure
                  // (returning false would leave garbage squatting on
                  // the version and tell the caller someone else won)
                  fs.delete(dst, false); throw e
                case Some(_) => false // the winner's object: a lost race
                case None => throw e  // nothing landed: environmental
              }
          }
      }
    }
}

/** Compare-and-swap in a process-local namespace — the contract spec's
  * fault-injection target and the template for an external-coordinator
  * arbiter. The filesystem still receives the object (readers read
  * files), but the WIN decision is the map's atomic putIfAbsent, so
  * the spec can race publishes against injected filesystem faults and
  * the one-winner property must survive them. */
final class InMemoryCasArbiter private (
    ledger: java.util.concurrent.ConcurrentHashMap[String, String])
    extends CommitArbiter {
  override def putIfAbsent(fs: FileSystem, dst: Path,
                           bytes: Array[Byte]): Boolean = {
    val token = java.util.UUID.randomUUID().toString
    val won = ledger.putIfAbsent(dst.toString, token) == null
    if (won) {
      val out = fs.create(dst, true) // the ledger already arbitrated
      try out.write(bytes) finally out.close()
    }
    won
  }
  override def delete(fs: FileSystem, dst: Path): Unit = {
    ledger.remove(dst.toString)
    super.delete(fs, dst)
  }
}

object InMemoryCasArbiter {
  private val spaces = new java.util.concurrent.ConcurrentHashMap[
    String, InMemoryCasArbiter]()
  def namespace(name: String): InMemoryCasArbiter =
    spaces.computeIfAbsent(name, _ => new InMemoryCasArbiter(
      new java.util.concurrent.ConcurrentHashMap[String, String]()))
}
