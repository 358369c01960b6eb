package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The named-table catalog: one json registry per warehouse dir,
  * names resolving through every entry point — library API, TXLOG
  * verbs, and plain SQL via session-catalog attach.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String =
    java.nio.file.Files.createTempDirectory("graft_catalog").toString

  private def withWarehouse(f: String => Unit): Unit = {
    val w = freshWarehouse()
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try f(w)
    finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }

  test("create/register/resolve/table/tables/drop round-trip; registry survives re-reads") {
    withWarehouse { w =>
      val d = spark.range(0, 50).select(col("id").as("k"), (col("id") * 1.0).as("v"))
      val path = Catalog.create(spark, "sales", d, statsCols = Seq("k"))
      assert(path == s"$w/sales")
      assert(Catalog.resolve(spark, "sales") == path)
      assert(Catalog.table(spark, "sales").count() == 50)
      // register an EXISTING external table dir under a second name
      val extPath = java.nio.file.Files
        .createTempDirectory("graft_cat_ext").toString + "/tbl"
      TxLog.create(Seq((1L, "a")).toDF("k", "s"), extPath)
      Catalog.register(spark, "dim", extPath)
      val t = Catalog.tables(spark).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
      assert(t.keySet == Set("sales", "dim"))
      assert(t("sales") == (1L, 50L), t.toString) // version, metadata rows
      assert(t("dim") == (1L, 1L))
      // unknown names are loud and name what exists
      val e = intercept[IllegalArgumentException](Catalog.resolve(spark, "nope"))
      assert(e.getMessage.contains("sales"), e.getMessage)
      // registering a non-table refuses
      intercept[IllegalArgumentException] {
        Catalog.register(spark, "ghost", "/tmp/does_not_exist_graft")
      }
      Catalog.drop(spark, "dim")
      assert(Catalog.tables(spark).count() == 1)
      // the table DIR survives a name drop (a registry never deletes data)
      assert(TxLog.read(spark, extPath).count() == 1)
    }
  }

  test("TXLOG verbs accept catalog names: CREATE lands under the warehouse, APPEND/MERGE/OPTIMIZE resolve") {
    withWarehouse { w =>
      spark.range(0, 20).select(col("id").as("k"), (col("id") * 1.0).as("v"))
        .createOrReplaceTempView("cat_src")
      try {
        graft.tools.Sql.exec(spark,
          "TXLOG CREATE 'facts' HIDDEN PARTITION BY bucket(4, k) " +
            "AS SELECT * FROM cat_src")
        assert(Catalog.resolve(spark, "facts") == s"$w/facts")
        graft.tools.Sql.exec(spark,
          "TXLOG APPEND INTO 'facts' SELECT k + 100 AS k, v FROM cat_src")
        assert(Catalog.table(spark, "facts").count() == 40)
        graft.tools.Sql.exec(spark,
          "TXLOG MERGE INTO 'facts' ON k USING " +
            "SELECT CAST(5 AS BIGINT) AS k, CAST(99.0 AS DOUBLE) AS v")
        assert(Catalog.table(spark, "facts")
          .filter(col("k") === 5L).select("v").as[Double].head() == 99.0)
        graft.tools.Sql.exec(spark, "TXLOG OPTIMIZE 'facts'")
        assert(Catalog.table(spark, "facts").count() == 40)
        // a PATH-shaped target bypasses the catalog entirely
        val extPath = java.nio.file.Files
          .createTempDirectory("graft_cat_path").toString + "/t"
        graft.tools.Sql.exec(spark,
          s"TXLOG CREATE '$extPath' AS SELECT * FROM cat_src")
        assert(TxLog.read(spark, extPath).count() == 20)
        assert(Catalog.tables(spark).count() == 1, "paths must not register")
      } finally spark.catalog.dropTempView("cat_src")
    }
  }

  test("attach registers names in the SESSION catalog: plain spark.sql reads them") {
    withWarehouse { _ =>
      Catalog.create(spark, "attach_demo",
        spark.range(0, 7).select(col("id").as("k")))
      try {
        Catalog.attach(spark)
        assert(spark.sql("SELECT sum(k) FROM attach_demo").head().getLong(0) == 21L)
        // idempotent: a second attach is a no-op, not a failure
        Catalog.attach(spark)
      } finally spark.sql("DROP TABLE IF EXISTS attach_demo")
    }
  }
}
