package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Multi-table transactions — ATOMIC OUTCOME via a journaled saga,
  * the honest scope for a storage layer whose tables commit
  * independently (Delta has no multi-table transactions at all;
  * Iceberg's need a catalog that owns every table pointer):
  *
  *  1. an INTENT journal lands first (`<journalRoot>/_txn/<id>.json`:
  *     every target table and its head version at start);
  *  2. the ops execute in order, the journal re-publishing after
  *     every table commit (temp+rename, crash-durable);
  *  3. failure compensates in REVERSE — each committed table RESTOREs
  *     to its pre-transaction head (a ref commit, zero data movement)
  *     — and rethrows with the compensation report;
  *  4. success deletes the journal.
  *
  * A crash leaves the journal behind; [[Txn.recover]] replays step 3
  * for every orphan. Compensation and recovery REFUSE to touch a
  * table whose head moved past this transaction's own commit (an
  * interleaved writer landed on top — rolling back would discard
  * THEIR commit): those surface loudly for manual resolution instead
  * of guessing.
  *
  * What this is NOT (documented, not hidden): cross-table SNAPSHOT
  * ISOLATION. A reader between steps sees table A committed and table
  * B not yet — the outcome is all-or-nothing, the visibility is not.
  * Per-table reads keep their usual snapshot isolation throughout.
  */
object Txn {

  sealed trait Op { def path: String }
  final case class Append(path: String, df: DataFrame,
                          evolveSchema: Boolean = false) extends Op
  final case class Merge(path: String, updates: DataFrame,
                         keys: Seq[String]) extends Op
  final case class Delete(path: String, condition: Column) extends Op
  final case class Update(path: String, set: Seq[(String, String)],
                          condition: Column) extends Op
  final case class MergeWhen(path: String, source: DataFrame,
                             keys: Seq[String],
                             matched: Seq[TxLog.MergeClause] = Nil,
                             notMatched: Seq[TxLog.MergeClause] = Nil,
                             notMatchedBySource: Seq[TxLog.MergeClause] = Nil)
    extends Op

  final class TxnFailedException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def txnDir(journalRoot: String) = new Path(journalRoot, "_txn")

  private def fsFor(spark: SparkSession, p: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(p),
      spark.sparkContext.hadoopConfiguration)

  /** One journal state: per table, the head at transaction start and
    * (once landed) the version this transaction committed. */
  private case class Entry(path: String, headBefore: Option[Long],
                           committed: Option[Long])

  private def publish(spark: SparkSession, journalRoot: String, id: String,
                      entries: Seq[Entry]): Unit = {
    val fs = fsFor(spark, journalRoot)
    fs.mkdirs(txnDir(journalRoot))
    val node = mapper.createObjectNode()
    node.put("id", id)
    node.put("ts", System.currentTimeMillis())
    val arr = node.putArray("entries")
    entries.foreach { e =>
      val en = arr.addObject()
      en.put("path", e.path)
      e.headBefore.foreach(en.put("headBefore", _))
      e.committed.foreach(en.put("committed", _))
    }
    val tmp = new Path(txnDir(journalRoot), s".$id.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
    val dst = new Path(txnDir(journalRoot), s"$id.json")
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"Txn: could not publish journal $dst")
  }

  private def readJournal(spark: SparkSession, f: Path): (String, Seq[Entry]) = {
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(f)
    val node = try mapper.readTree(in) finally in.close()
    val arr = node.get("entries")
    val entries = (0 until arr.size()).map { i =>
      val e = arr.get(i)
      Entry(e.get("path").asText(),
        Option(e.get("headBefore")).map(_.asLong()),
        Option(e.get("committed")).map(_.asLong()))
    }
    (node.get("id").asText(), entries)
  }

  /** Compensate every committed entry in reverse: restore each table
    * to its pre-transaction head — UNLESS its current head is no
    * longer this transaction's own commit (an interleaved writer
    * landed; rolling back would discard their work). Returns
    * (restored, conflicted, indeterminate) table lists.
    *
    * INDETERMINATE covers the journal's one-commit blind spot: a
    * crash BETWEEN a table's commit and the journal republish leaves
    * the entry with `headBefore` but no `committed`. If that table's
    * head has since moved, the mover may have been this transaction
    * OR an interleaved writer — indistinguishable without commit
    * provenance, so recovery reports it loudly and touches nothing. */
  private def compensate(spark: SparkSession, entries: Seq[Entry])
      : (Seq[String], Seq[String], Seq[String]) = {
    val restored = scala.collection.mutable.ArrayBuffer.empty[String]
    val conflicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val indeterminate = scala.collection.mutable.ArrayBuffer.empty[String]
    entries.reverse.foreach { e =>
      (e.committed, e.headBefore) match {
        case (Some(c), Some(hb)) =>
          val cur = TxLog.currentVersion(spark, e.path)
          if (!cur.contains(c)) conflicted += e.path
          else {
            // the head IS this failed transaction's own commit —
            // rollback of an incomplete transaction bypasses the
            // appendOnly gate (see TxLog.restoreCompensating)
            TxLog.restoreCompensating(spark, e.path, hb)
            restored += e.path
          }
        case (None, Some(hb)) =>
          if (!TxLog.currentVersion(spark, e.path).contains(hb))
            indeterminate += e.path
        case _ => // table didn't exist at start: nothing to undo
      }
    }
    (restored.toSeq, conflicted.toSeq, indeterminate.toSeq)
  }

  /** Run `ops` as one transaction against `journalRoot` (the catalog
    * warehouse is the natural home). Returns the committed version
    * per op, in order. On failure every committed table restores to
    * its pre-transaction head and [[TxnFailedException]] rethrows
    * with the compensation report. */
  def transact(spark: SparkSession, journalRoot: String,
               ops: Seq[Op]): Seq[Long] = {
    require(ops.nonEmpty, "Txn.transact: no operations")
    val id = java.util.UUID.randomUUID().toString.take(16)
    // intent: heads at start, FIRST occurrence per table (a later op
    // on the same table compensates to the transaction's entry state)
    var entries: Seq[Entry] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      ops.flatMap { op =>
        if (seen.add(op.path))
          Some(Entry(op.path, TxLog.currentVersion(spark, op.path), None))
        else None
      }
    }
    publish(spark, journalRoot, id, entries)
    val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      // auto-compact follow-ons are suppressed inside the op loop: a
      // heal commit between two ops would move a table's head past the
      // journal's recorded commit and strand compensation (see
      // TxLog.suppressFollowOnCompact). The next ordinary commit heals.
      TxLog.suppressFollowOnCompact { ops.foreach { op =>
        val v = op match {
          case Append(p, df, ev) => TxLog.append(df, p, evolveSchema = ev)
          case Merge(p, u, k) => TxLog.mergeInto(p, u, k)
          case Delete(p, c) => TxLog.deleteWhere(spark, p, c)
          case Update(p, s, c) => TxLog.updateWhere(spark, p, s, c)
          case MergeWhen(p, src, k, mm, nm, nms) =>
            TxLog.mergeWhen(p, src, k, mm, nm, nms)
        }
        versions += v
        entries = entries.map(e =>
          if (e.path == op.path) e.copy(committed = Some(v)) else e)
        publish(spark, journalRoot, id, entries)
      } }
      fsFor(spark, journalRoot)
        .delete(new Path(txnDir(journalRoot), s"$id.json"), false)
      versions.toSeq
    } catch {
      case scala.util.control.NonFatal(cause) =>
        // live failure: the failing op never committed, so no entry is
        // in the indeterminate state — only crash recovery can be
        val (restored, conflicted, _) = compensate(spark, entries)
        if (conflicted.isEmpty)
          fsFor(spark, journalRoot)
            .delete(new Path(txnDir(journalRoot), s"$id.json"), false)
        throw new TxnFailedException(
          s"Txn $id failed and compensated: restored " +
            s"[${restored.mkString(", ")}]" +
            (if (conflicted.nonEmpty)
              s"; CONFLICTED (interleaved writer, left as-is, journal kept) " +
                s"[${conflicted.mkString(", ")}]"
             else ""), cause)
    }
  }

  /** Name-addressed form: ops may target catalog NAMES (resolved via
    * `graft.catalog.warehouse`, like every TXLOG verb), and the
    * warehouse doubles as the journal root — the natural home, since
    * the catalog is what makes "these tables belong together" a
    * statement rather than a convention. */
  def transact(spark: SparkSession, ops: Seq[Op]): Seq[Long] = {
    val wh = spark.conf.getOption("graft.catalog.warehouse").getOrElse(
      throw new IllegalArgumentException(
        "Txn.transact(ops): set graft.catalog.warehouse, or pass an " +
          "explicit journalRoot with path-addressed ops"))
    def rt(p: String) = Catalog.resolveTarget(spark, p)
    transact(spark, wh, ops.map {
      case Append(p, df, ev) => Append(rt(p), df, ev)
      case Merge(p, u, k) => Merge(rt(p), u, k)
      case Delete(p, c) => Delete(rt(p), c)
      case Update(p, s, c) => Update(rt(p), s, c)
      case MergeWhen(p, src, k, m, nm, nms) =>
        MergeWhen(rt(p), src, k, m, nm, nms)
    })
  }

  /** Recover orphaned transactions after a crash: compensate each
    * journal under `<journalRoot>/_txn/` exactly as a live failure
    * would, deleting journals whose compensation completed. Returns
    * one row per journal: (txn id, restored tables, conflicted
    * tables). Safe to re-run: compensation only ever restores a table
    * whose head IS this transaction's own commit. A journal that
    * crashed after its compensation but before its deletion therefore
    * re-reports those tables as conflicted (the head moved — by the
    * compensation itself) and keeps the journal for inspection: loud
    * and idle, never a second rollback. */
  def recover(spark: SparkSession, journalRoot: String): DataFrame = {
    import spark.implicits._
    val fs = fsFor(spark, journalRoot)
    val dir = txnDir(journalRoot)
    val rows =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
        .map { st =>
          val (id, entries) = readJournal(spark, st.getPath)
          val (restored, conflicted, indeterminate) = compensate(spark, entries)
          if (conflicted.isEmpty && indeterminate.isEmpty)
            fs.delete(st.getPath, false)
          (id, restored, conflicted, indeterminate)
        }
    rows.toDF("txn", "restored", "conflicted", "indeterminate")
  }
}
