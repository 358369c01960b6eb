package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.tables.Tables

/** Ad-hoc SQL entry point over the test star schema — the engine's
  * interactive front door, standing in for the reference's Shiny/dbplyr
  * app (gwasDB/app.R). Usage:
  *
  *   sbt "runMain graft.tools.Sql /root/testdata/sf0.01 \
  *     SELECT l_suppkey, count(*) FROM lineitem GROUP BY 1 ORDER BY 1"
  *
  * Every driver table registers as a temp view under its own name, so
  * each `SparkEntry.oracleSql` query (ANSI SQL) runs here verbatim.
  * The same `registerAll` + `spark.sql` pair is what a long-running
  * SQL endpoint (Spark Connect / Thrift) would serve per request.
  */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view (lazy — no scan happens
    * until a query runs, and queries prune/push down through views
    * exactly as through the DataFrame API). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      Tables.table(spark, sfDir, t) // schema check: fail fast if missing
      (t match {
        case "events" => Tables.events(spark, sfDir) // ns→µs ts shim
        case _ => Tables.table(spark, sfDir, t)
      }).createOrReplaceTempView(t)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.error("usage: Sql <sfDir> <sql...>"))
    val sql = args.drop(1).mkString(" ")
    val spark = GraftSession.get("graft-sql")
    registerAll(spark, sfDir)
    if (sql.nonEmpty) spark.sql(sql).show(100, truncate = false)
    else tableNames.foreach(t => println(s"view: $t"))
    spark.stop()
  }
}
