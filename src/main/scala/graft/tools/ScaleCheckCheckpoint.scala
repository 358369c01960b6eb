package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Checkpoints, Graph}

/** Scale harness for the r17 reliable-checkpoint seam: the price of
  * `graft.checkpointDir` (per-round writes to shared storage, which
  * survive executor loss) over the default localCheckpoint (executor
  * blocks — fast, but an executor loss mid-loop fails the job). The
  * claim: the reliable mode's overhead is a bounded constant factor on
  * the CUT cost, not a new asymptotic term — at cluster scale it buys
  * partition-level recovery on jobs whose probability of losing SOME
  * executor approaches 1.
  *
  * Usage: `sbt "runMain graft.tools.ScaleCheckCheckpoint"`. */
object ScaleCheckCheckpoint {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scaleckpt")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def edges(n: Long) = spark.range(0, n).select(
      col("id").as("src"), ((col("id") * 31 + 7) % n).as("dst"))

    def run(n: Long, reliable: Boolean): Double = {
      if (reliable) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"scaleckpt_$n").toString
        spark.conf.set(Checkpoints.DirConf, dir)
      }
      try {
        Graph.pagerank(edges(n), iterations = 5).count() // warm
        timed(Graph.pagerank(edges(n), iterations = 5).count())
      } finally spark.conf.unset(Checkpoints.DirConf)
    }

    Seq(1000000L, 10000000L).foreach { n =>
      val local = run(n, reliable = false)
      val rel = run(n, reliable = true)
      println(f"[scaleckpt] pagerank(5 iters) on $n%9d edges: " +
        f"localCheckpoint ${local}%6.2f s, reliable checkpoint " +
        f"${rel}%6.2f s -> ${rel / local}%4.2fx (constant-factor cut " +
        "cost; buys partition recovery after executor loss)")
    }
    spark.stop()
  }
}
