package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.{Catalog, TxLog}

/** Scale harness for the V2-CATALOG DML door: does a plain-SQL
  * `MERGE INTO graft.t` / selective `SELECT` cost the same at a
  * 2×10^4-file head as at a 2×10^3-file head — i.e. does the catalog
  * door really INHERIT the format mount's flat planning
  * (ScaleCheckIndex) and the merge verbs' file-granular discovery
  * (ScaleCheckMerge), rather than us asserting it from shared code?
  *
  * The tables are REAL (one `create` from a repartitioned range — N
  * parquet files with per-file key stats), so the statements run END
  * TO END through Spark's own resolver: loadTable → GraftAnalysis
  * lowering → TxLogFileIndex planning / mergeWhen discovery → commit.
  * Each tier runs the same needle merge (20 keys) and selective sum
  * through BOTH doors (plain SQL vs the Scala verb) — the per-door
  * delta is the catalog's own overhead, the per-tier ratio is the
  * scaling answer. Usage: `sbt "runMain graft.tools.ScaleCheckCatalog"`
  * (add a files-per-tier arg to override 2000,20000). */
object ScaleCheckCatalog {
  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalecat")
    val tiers = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(2000, 20000))
    val wh = java.nio.file.Files
      .createTempDirectory("graft_scalecat_wh").toString
    spark.conf.set("graft.catalog.warehouse", wh)
    tiers.foreach { n =>
      val name = s"big$n"
      // N files, 50 rows each, disjoint per-file key ranges -> the
      // needle prune must hit exactly 1-20 files whatever N is
      val rows = n.toLong * 50L
      val df = spark.range(rows)
        .select(col("id").as("k"), (col("id") % 97).cast("double").as("v"))
        .repartitionByRange(n, col("k"))
      val tCreate = timeIt {
        TxLog.create(df, s"$wh/$name", statsCols = Seq("k"))
        Catalog.register(spark, name, s"$wh/$name")
      }
      val m = TxLog.manifest(spark, s"$wh/$name",
        TxLog.currentVersion(spark, s"$wh/$name").get)
      println(f"[scalecat] tier $n%6d: created ${m.files.size}%6d files " +
        f"in $tCreate%6.1f s")
      // needle source: 20 CONSECUTIVE keys (10 matched + 10 past the
      // end, so INSERT fires too) — the stats range prune must hit ~1
      // file whatever N is. Spread keys would widen the key-bounds
      // declaration to the whole table by design (build a Bloom index
      // for that shape); the needle is what "flat in N" promises.
      spark.range(20)
        .select((col("id") + lit(rows - 10)).as("k"), lit(-1.0).as("v"))
        .createOrReplaceTempView(s"src_$name")
      val tSql = timeIt {
        spark.sql(s"MERGE INTO graft.$name t USING src_$name s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET v = s.v " +
          "WHEN NOT MATCHED THEN INSERT *").collect()
      }
      val tVerb = timeIt {
        TxLog.mergeWhen(s"$wh/$name", spark.table(s"src_$name"), Seq("k"),
          matched = Seq(TxLog.MergeClause(None, "update", Seq("v" -> "src.v"))),
          notMatched = Seq(TxLog.MergeClause(None, "insert")))
      }
      val tSel = timeIt {
        val got = spark.sql(s"SELECT sum(v) AS s FROM graft.$name " +
          s"WHERE k BETWEEN ${rows / 2} AND ${rows / 2 + 49}").head()
        require(!got.isNullAt(0), "selective sum returned null")
      }
      val tSelVerb = timeIt {
        spark.read.format("graft-txlog").option("path", s"$wh/$name").load()
          .filter(col("k").between(rows / 2, rows / 2 + 49))
          .agg(sum("v")).head()
      }
      println(f"[scalecat] tier $n%6d: MERGE sql=$tSql%6.2f s " +
        f"verb=$tVerb%6.2f s | SELECT sql=$tSel%6.2f s mount=$tSelVerb%6.2f s")
    }
    spark.stop()
  }
}
