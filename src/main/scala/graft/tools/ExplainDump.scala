package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Dump `.explain("formatted")` for named declared queries to
  * plans/<round>/<key>_<tag>.txt — the before/after plan evidence an
  * optimization round must commit alongside its code.
  *
  * Usage: runMain graft.tools.ExplainDump <round> <tag> <key> [<key> ...]
  * e.g.   runMain graft.tools.ExplainDump r19 before q_mad q_winsorize
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <round> <tag> <key> [<key> ...]")
    val round = args(0)
    val tag = args(1)
    val keys = args.drop(2)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-explaindump")
    val qs = graft.SparkEntry.queries
    Files.createDirectories(Paths.get(s"plans/$round"))
    keys.foreach { k =>
      qs.get(k) match {
        case Some(fn) =>
          val df = fn(spark, d)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val p = Paths.get(s"plans/$round/${k}_$tag.txt")
          Files.writeString(p, s"# $k ($tag, sf=$d)\n\n$plan")
          println(s"[explaindump] wrote $p")
        case None =>
          System.err.println(s"[explaindump] unknown query key: $k")
      }
    }
    spark.stop()
  }
}
