package graft.storage

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r17 verdict's #1 missing piece: a pluggable commit arbiter so
  * the TxLog publish step (and ArtifactLock acquisition) is exact on
  * object stores with conditional writes, not only where rename
  * refuses an existing destination. The CONTRACT, driven through all
  * three arbiters and through injected filesystem faults: of any set
  * of racing publishes to one destination, EXACTLY ONE wins, the
  * winner's bytes are what lands, and every loser is told loudly. */
class CommitArbiterSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDst(tag: String): Path = new Path(
    java.nio.file.Files.createTempDirectory(s"graft_arb_$tag").toString,
    "v1.json")

  private def raceN(arbiter: CommitArbiter, fs: FileSystem, dst: Path,
                    n: Int): (Int, Array[Byte]) = {
    val payloads = (0 until n).map(i =>
      s"""{"writer":$i,"pad":"${"x" * 64}"}""".getBytes("UTF-8"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val wins = (0 until n).map { i =>
      Future {
        gate.await()
        arbiter.putIfAbsent(fs, dst, payloads(i))
      }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(wins), 60.seconds)
    val winners = results.zipWithIndex.filter(_._1).map(_._2)
    assert(winners.length == 1,
      s"exactly one racer must win, got ${winners.length}: $winners")
    val in = fs.open(dst)
    val onDisk = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(onDisk, payloads(winners.head)),
      "the landed bytes must be the winner's")
    (winners.head, onDisk)
  }

  test("contract: 8 racing publishes, exactly one winner — all three arbiters") {
    val fs = FileSystem.get(new java.net.URI("file:///"), hconf)
    raceN(RenameCommitArbiter, fs, freshDst("ren"), 8)
    raceN(CreateExclusiveCommitArbiter, fs, freshDst("cex"), 8)
    raceN(InMemoryCasArbiter.namespace("spec_race"), fs, freshDst("mem"), 8)
  }

  test("contract: a second publish to a taken destination loses; winner's bytes survive") {
    val fs = FileSystem.get(new java.net.URI("file:///"), hconf)
    Seq[CommitArbiter](RenameCommitArbiter, CreateExclusiveCommitArbiter,
      InMemoryCasArbiter.namespace("spec_seq")).zipWithIndex.foreach {
      case (arb, i) =>
        val dst = freshDst(s"seq$i")
        assert(arb.putIfAbsent(fs, dst, "first".getBytes("UTF-8")))
        assert(!arb.putIfAbsent(fs, dst, "second".getBytes("UTF-8")),
          s"${arb.getClass.getSimpleName}: the late publish must lose")
        val in = fs.open(dst)
        val b = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        assert(b == "first", s"winner's bytes must survive, got '$b'")
    }
  }

  test("fault: overwriting rename (POSIX semantics) cannot produce two winners") {
    // a FilterFileSystem whose rename REPLACES its destination — the
    // semantics class the rename contract documents as dev-only. The
    // arbiter's exists-check + per-destination JVM guard must still
    // keep racing THREADS to one winner.
    val raw = FileSystem.get(new java.net.URI("file:///"), hconf)
    val fs = new FilterFileSystem(raw) {
      override def rename(src: Path, dst: Path): Boolean = {
        if (super.exists(dst)) super.delete(dst, false)
        super.rename(src, dst)
      }
    }
    raceN(RenameCommitArbiter, fs, freshDst("posix"), 8)
  }

  test("fault: a spuriously failing rename is a loud loss, no temp litter") {
    val raw = FileSystem.get(new java.net.URI("file:///"), hconf)
    val fs = new FilterFileSystem(raw) {
      override def rename(src: Path, dst: Path): Boolean = false
    }
    val dst = freshDst("flaky")
    assert(!RenameCommitArbiter.putIfAbsent(fs, dst, "x".getBytes("UTF-8")),
      "a failed rename must report a loss, never a win")
    val leftovers = raw.listStatus(dst.getParent)
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp litter after a loss: ${leftovers.toSeq}")
  }

  test("fault: a torn create-exclusive write sweeps its partial and THROWS (never a quiet loss)") {
    val raw = FileSystem.get(new java.net.URI("file:///"), hconf)
    val boom = new java.io.IOException("injected: connection torn mid-write")
    val fs = new FilterFileSystem(raw) {
      override def create(f: Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        val out = super.create(f, overwrite)
        new org.apache.hadoop.fs.FSDataOutputStream(
          new java.io.OutputStream {
            var written = 0
            override def write(b: Int): Unit = {
              if (written >= 3) throw boom
              out.write(b); written += 1
            }
            override def close(): Unit = out.close()
          }, null)
      }
    }
    val dst = freshDst("torn")
    val e = intercept[java.io.IOException] {
      CreateExclusiveCommitArbiter.putIfAbsent(
        fs, dst, "longer-than-three".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("injected"), e.getMessage)
    assert(!raw.exists(dst),
      "the torn partial must be swept, not left squatting on the version")
  }

  test("fault: a conditional loss at close keeps the winner's object and reports a loss") {
    // simulate If-None-Match arbitration at close: the stream buffers,
    // and close() finds the destination already taken → 412-style
    // failure with the WINNER's complete object on disk
    val raw = FileSystem.get(new java.net.URI("file:///"), hconf)
    val dst = freshDst("cond")
    val winner = "the-winners-commit-json".getBytes("UTF-8")
    val fs = new FilterFileSystem(raw) {
      override def create(f: Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        new org.apache.hadoop.fs.FSDataOutputStream(
          new java.io.ByteArrayOutputStream() {
            override def close(): Unit = {
              // the winner's PUT landed first
              val out = raw.create(f, true)
              try out.write(winner) finally out.close()
              throw new java.io.IOException(
                "PreconditionFailed: at-close conditional write lost (412)")
            }
          }, null)
    }
    assert(!CreateExclusiveCommitArbiter.putIfAbsent(
      fs, dst, "the-losers-commit-json".getBytes("UTF-8")),
      "a 412-at-close must report a loss")
    val in = raw.open(dst)
    val b = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(b == "the-winners-commit-json",
      s"the winner's object must survive the loser's failure, got '$b'")
  }

  test("TxLog end-to-end through the conditional arbiter; racing same-version commits, one winner") {
    spark.conf.set(CommitArbiter.Conf, "conditional")
    try {
      val path = java.nio.file.Files
        .createTempDirectory("graft_arb_txlog").toString + "/t"
      TxLog.create(spark.range(0, 100).select(col("id").as("k")), path)
      TxLog.append(spark.range(100, 150).select(col("id").as("k")), path)
      TxLog.deleteWhere(spark, path, col("k") < 10L)
      assert(TxLog.read(spark, path).count() == 140L)
      assert(TxLog.currentVersion(spark, path).contains(3L))
      // two writers race the SAME next version: exactly one commit
      // lands per version; the loser either retries onto the next
      // version (append's OCC loop) or surfaces VersionRaceException —
      // in all cases both rows land exactly once or one failed loudly
      val gate = new java.util.concurrent.CountDownLatch(1)
      val fs = (0 until 2).map { i =>
        Future {
          gate.await()
          try {
            TxLog.append(Seq((1000L + i)).toDF("k"), path); None
          } catch {
            case e: Exception
                if e.getMessage != null &&
                  e.getMessage.contains("concurrent commit") => Some(e)
          }
        }
      }
      gate.countDown()
      val outcomes = Await.result(Future.sequence(fs), 120.seconds)
      val landed = TxLog.read(spark, path)
        .filter(col("k") >= 1000L).count()
      assert(landed + outcomes.count(_.nonEmpty) == 2L,
        s"each racer must land exactly once or lose loudly: " +
          s"landed=$landed outcomes=$outcomes")
    } finally spark.conf.unset(CommitArbiter.Conf)
  }

  test("ArtifactLock acquisition through the in-memory CAS arbiter serializes maintainers") {
    spark.conf.set(CommitArbiter.Conf, "memory:spec_lock")
    try {
      val art = java.nio.file.Files
        .createTempDirectory("graft_arb_lock").toString + "/a"
      val order = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val fs = (0 until 3).map { i =>
        Future {
          graft.operators.ArtifactLock.withLock(spark, art, s"m$i") {
            order.add(s"enter$i"); Thread.sleep(50); order.add(s"exit$i")
          }
        }
      }
      Await.result(Future.sequence(fs), 60.seconds)
      val seq = order.toArray(Array.empty[String]).toSeq
      // strict serialization: every enter is immediately followed by
      // its own exit
      seq.grouped(2).foreach { pair =>
        assert(pair.length == 2 &&
          pair(0).startsWith("enter") && pair(1).startsWith("exit") &&
          pair(0).drop(5) == pair(1).drop(4),
          s"maintainers interleaved: $seq")
      }
    } finally spark.conf.unset(CommitArbiter.Conf)
  }
}
