package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DataSource V2 `TableCatalog` (`graft.*`): Spark's OWN resolver
  * serving graft tables by name — the reference's actual UX
  * (`tbl(con, "combined")` behind dbplyr, gwasDB/app.R:133). Plain SQL
  * DDL + DML round-trips: CREATE/CTAS, SELECT (incl. time travel),
  * INSERT INTO/OVERWRITE, DELETE/UPDATE/MERGE, ALTER, DROP — reads
  * plan onto the SAME V1 parquet mount as the `graft-txlog` format
  * (pushdown intact), writes onto the transactional verbs.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def withWarehouse(f: String => Unit): Unit = {
    val w = java.nio.file.Files.createTempDirectory("graft_v2cat").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try f(w)
    finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }

  test("CREATE TABLE + INSERT INTO + SELECT: the full plain-SQL loop") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.cust (k BIGINT, seg STRING, amt DOUBLE) " +
        "PARTITIONED BY (seg)")
      assert(TxLog.currentVersion(spark, s"$w/cust").contains(1L),
        "CREATE TABLE must land a TxLog table in the warehouse")
      spark.sql("INSERT INTO graft.cust VALUES " +
        "(1, 'a', 10.0), (2, 'b', 20.0), (3, 'a', 30.0)")
      val out = spark.sql(
        "SELECT seg, sum(amt) AS s FROM graft.cust GROUP BY seg ORDER BY seg")
        .as[(String, Double)].collect().toSeq
      assert(out == Seq(("a", 40.0), ("b", 20.0)), out.toString)
      // the name is ONE namespace with the Scala API and the TXLOG verbs
      assert(Catalog.table(spark, "cust").count() == 3)
      graft.tools.Sql.exec(spark,
        "TXLOG APPEND INTO 'cust' SELECT CAST(4 AS BIGINT) AS k, " +
          "'b' AS seg, CAST(5.0 AS DOUBLE) AS amt")
      assert(spark.sql("SELECT count(*) AS n FROM graft.cust")
        .head().getLong(0) == 4L)
      // SHOW TABLES sees the registry
      val shown = spark.sql("SHOW TABLES IN graft").select("tableName")
        .as[String].collect().toSet
      assert(shown.contains("cust"), shown.toString)
    }
  }

  test("reads plan onto the V1 parquet mount: pushdown + partition pruning intact") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.scan (k BIGINT, seg STRING, amt DOUBLE) " +
        "PARTITIONED BY (seg)")
      spark.sql("INSERT INTO graft.scan SELECT id AS k, " +
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg, " +
        "CAST(id AS DOUBLE) AS amt FROM range(100)")
      val df = spark.sql(
        "SELECT k FROM graft.scan WHERE seg = 'a' AND k > 10")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Scan parquet") || plan.contains("FileScan"),
        s"catalog read must serve through the V1 parquet mount:\n$plan")
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
        s"data filter must push to the scan:\n$plan")
      assert(df.count() == 44) // even ids 12..98
      // partition pruning: only seg=a files planned
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.toString.linesIterator.find(_.contains("seg=")))
      assert(!plan.contains("seg=b"), "partition seg=b must be pruned")
    }
  }

  test("CTAS, INSERT OVERWRITE, and static-partition overwrite") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.src_nums AS " +
        "SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(10)")
      assert(spark.sql("SELECT sum(k) AS s FROM graft.src_nums")
        .head().getLong(0) == 45L)
      // truncate-overwrite: one commit, history kept
      spark.sql("INSERT OVERWRITE graft.src_nums " +
        "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(3)")
      assert(spark.sql("SELECT count(*) AS n, sum(k) AS s FROM graft.src_nums")
        .as[(Long, Long)].head() == ((3L, 3L)))
      // prior snapshot still served through time travel (atomic CTAS:
      // the data IS v1 — one commit, no empty-then-append two-step)
      assert(spark.sql("SELECT count(*) AS n FROM graft.src_nums VERSION AS OF 1")
        .head().getLong(0) == 10L)
      // static-partition overwrite -> replacePartitions (atomic)
      spark.sql("CREATE TABLE graft.daily (k BIGINT, d STRING) PARTITIONED BY (d)")
      spark.sql("INSERT INTO graft.daily VALUES (1, 'mon'), (2, 'tue')")
      spark.sql("INSERT OVERWRITE graft.daily PARTITION (d = 'mon') " +
        "SELECT id + 10 AS k FROM range(2)")
      val rows = spark.sql("SELECT k, d FROM graft.daily ORDER BY k")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((2L, "tue"), (10L, "mon"), (11L, "mon")), rows.toString)
    }
  }

  test("DELETE / UPDATE / MERGE as plain SQL lower onto the transactional verbs") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.acct (k BIGINT, status STRING, amt DOUBLE) " +
        "PARTITIONED BY (status)")
      spark.sql("INSERT INTO graft.acct VALUES " +
        "(1, 'open', 10.0), (2, 'open', 20.0), (3, 'hold', 30.0), (4, 'hold', 40.0)")
      spark.sql("DELETE FROM graft.acct WHERE amt >= 40")
      assert(spark.sql("SELECT count(*) AS n FROM graft.acct").head().getLong(0) == 3L)
      spark.sql("UPDATE graft.acct SET amt = amt + 1 WHERE k <= 2")
      assert(spark.sql("SELECT sum(amt) AS s FROM graft.acct").head().getDouble(0)
        == 10.0 + 20.0 + 30.0 + 2.0)
      // MERGE: conditional update + insert *, CASE inside the condition
      Seq((2L, "upd", 100.0), (9L, "new", 90.0), (3L, "upd", 0.0))
        .toDF("k", "status", "amt").createOrReplaceTempView("acct_updates")
      spark.sql(
        """MERGE INTO graft.acct t USING acct_updates s ON t.k = s.k
          |WHEN MATCHED AND s.amt > t.amt THEN UPDATE SET amt = s.amt
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val out = spark.sql("SELECT k, amt FROM graft.acct ORDER BY k")
        .as[(Long, Double)].collect().toSeq
      assert(out == Seq((1L, 11.0), (2L, 100.0), (3L, 30.0), (9L, 90.0)),
        out.toString)
      // MERGE delete + NOT MATCHED BY SOURCE
      Seq((1L, "x", 0.0)).toDF("k", "status", "amt")
        .createOrReplaceTempView("acct_keep")
      spark.sql(
        """MERGE INTO graft.acct t USING acct_keep s ON t.k = s.k
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED BY SOURCE AND t.k > 3 THEN DELETE""".stripMargin)
      assert(spark.sql("SELECT k FROM graft.acct ORDER BY k")
        .as[Long].collect().toSeq == Seq(2L, 3L))
    }
  }

  test("ALTER TABLE: add/rename/drop column and type widening, metadata-only") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.ddl_t AS SELECT CAST(id AS INT) AS k, " +
        "CAST(id AS DOUBLE) AS v FROM range(5)")
      spark.sql("ALTER TABLE graft.ddl_t ADD COLUMN note STRING")
      spark.sql("ALTER TABLE graft.ddl_t RENAME COLUMN note TO memo")
      spark.sql("ALTER TABLE graft.ddl_t ALTER COLUMN k TYPE BIGINT")
      val schema = spark.sql("SELECT * FROM graft.ddl_t").schema
      assert(schema.fieldNames.toSeq == Seq("k", "v", "memo"), schema.toString)
      assert(schema("k").dataType ==
        org.apache.spark.sql.types.LongType)
      spark.sql("ALTER TABLE graft.ddl_t DROP COLUMN memo")
      assert(spark.sql("SELECT * FROM graft.ddl_t").columns.toSeq == Seq("k", "v"))
      assert(spark.sql("SELECT sum(k) AS s FROM graft.ddl_t").head().getLong(0) == 10L)
    }
  }

  test("time travel, rename, drop: registry-level DDL; data never deleted") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.tt AS SELECT id AS k FROM range(4)")
      spark.sql("INSERT INTO graft.tt VALUES (100)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.tt VERSION AS OF 1")
        .head().getLong(0) == 4L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.tt").head().getLong(0) == 5L)
      // tags resolve through VERSION AS OF too
      TxLog.tag(spark, s"$w/tt", "prod", Some(1L))
      assert(spark.sql("SELECT count(*) AS n FROM graft.tt VERSION AS OF 'prod'")
        .head().getLong(0) == 4L)
      spark.sql("ALTER TABLE graft.tt RENAME TO tt2") // within-catalog rename
      assert(spark.sql("SELECT count(*) AS n FROM graft.tt2").head().getLong(0) == 5L)
      spark.sql("DROP TABLE graft.tt2")
      assert(!spark.catalog.tableExists("graft.tt2"))
      // dropping the NAME leaves the table dir intact
      assert(TxLog.currentVersion(spark, s"$w/tt").contains(2L))
    }
  }

  test("atomic CTAS / REPLACE TABLE: one commit, abort leaves no trace, RTAS keeps history") {
    withWarehouse { w =>
      // a FAILED CTAS must register nothing and leave no table dir
      intercept[Exception] {
        spark.sql("CREATE TABLE graft.ghost AS " +
          "SELECT raise_error('boom') AS x FROM range(1)")
      }
      assert(!spark.catalog.tableExists("graft.ghost"), "name must not register")
      assert(!new java.io.File(s"$w/ghost").exists, "aborted dir must be swept")
      // a successful CTAS is ONE commit (v1 = the data)
      spark.sql("CREATE TABLE graft.rt AS SELECT id AS k FROM range(5)")
      assert(TxLog.currentVersion(spark, s"$w/rt").contains(1L),
        "CTAS must land as a single commit")
      // REPLACE TABLE ... AS SELECT: full redefinition, history kept
      spark.sql("REPLACE TABLE graft.rt AS " +
        "SELECT id AS k, CAST(id AS STRING) AS v FROM range(2)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.rt").head().getLong(0) == 2L)
      assert(spark.sql("SELECT * FROM graft.rt").columns.toSeq == Seq("k", "v"))
      assert(spark.sql("SELECT count(*) AS n FROM graft.rt VERSION AS OF 1")
        .head().getLong(0) == 5L, "pre-replace snapshot must survive")
      // CREATE OR REPLACE on a missing table creates
      spark.sql("CREATE OR REPLACE TABLE graft.rt2 AS SELECT 1 AS one")
      assert(spark.sql("SELECT one FROM graft.rt2").head().getInt(0) == 1)
    }
  }

  test("aborted CTAS at a pre-existing LOCATION never deletes data it did not create") {
    withWarehouse { w =>
      // an UNREGISTERED graft table already lives at the target path
      import spark.implicits._
      val loc = s"$w/preexisting"
      TxLog.create(Seq((1L, "keep")).toDF("k", "v"), loc)
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.overlay LOCATION '$loc' AS " +
          "SELECT CAST(id AS BIGINT) AS k, raise_error('boom') AS v FROM range(1)")
      }
      assert(!spark.catalog.tableExists("graft.overlay"))
      // the pre-existing table (and its history) survives the abort
      assert(TxLog.read(spark, loc).select("v").head().getString(0) == "keep",
        "abort must restore, never recursively delete, a pre-existing path")
      // a plain directory with foreign bytes survives too
      val rawDir = new java.io.File(s"$w/rawdir"); rawDir.mkdirs()
      val marker = new java.io.File(rawDir, "precious.txt")
      java.nio.file.Files.writeString(marker.toPath, "do not delete")
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.overlay2 LOCATION '${rawDir.getPath}' AS " +
          "SELECT raise_error('boom') AS x FROM range(1)")
      }
      assert(marker.exists, "abort must not sweep a directory it did not create")
    }
  }

  test("ALTER TABLE ADD COLUMN DEFAULT passes through; position/comment refuse loudly") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.addc (k BIGINT)")
      spark.sql("INSERT INTO graft.addc VALUES (1)")
      spark.sql("ALTER TABLE graft.addc ADD COLUMN c INT DEFAULT 5")
      // the default is IN FORCE: an insert omitting c fills 5, old rows read null
      spark.sql("INSERT INTO graft.addc (k) VALUES (2)")
      val rows = spark.sql("SELECT k, c FROM graft.addc ORDER BY k").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      assert(rows == Map(1L -> None, 2L -> Some(5)), rows.toString)
      // unsupported facets refuse instead of silently dropping
      intercept[Exception] {
        spark.sql("ALTER TABLE graft.addc ADD COLUMN p INT FIRST") }
      intercept[Exception] {
        spark.sql("ALTER TABLE graft.addc ADD COLUMN q INT COMMENT 'x'") }
    }
  }

  test("ADD/DROP CONSTRAINT through Spark's resolver: the write-time gate binds") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.cst AS " +
        "SELECT id AS k, CAST(id AS DOUBLE) AS amt FROM range(5)")
      spark.sql("ALTER TABLE graft.cst ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
      // TWO gates now bind: Spark's own V2 write-time enforcement
      // (constraints() reports the CHECK, so the write plan carries
      // it — CHECK_CONSTRAINT_VIOLATION) and TxLog's commit gate
      // behind it; whichever fires, nothing commits
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.cst VALUES (9, -1.0)")
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m => m.contains("violates constraint") ||
        m.contains("CHECK_CONSTRAINT_VIOLATION")), e.toString)
      spark.sql("INSERT INTO graft.cst VALUES (9, 9.0)") // passing row lands
      assert(spark.sql("SELECT count(*) AS n FROM graft.cst").head().getLong(0) == 6L)
      // the table reports its enforced set through the V2 API
      val t = spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty[String], "cst"))
      assert(t.constraints().exists(_.name == "amt_pos"), "CHECK must surface")
      spark.sql("ALTER TABLE graft.cst DROP CONSTRAINT amt_pos")
      spark.sql("INSERT INTO graft.cst VALUES (10, -5.0)") // gate lifted
      assert(TxLog.constraintsOf(spark, s"$w/cst").isEmpty)
    }
  }

  test("spark.readStream.table: catalog names stream through the txlog source") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.feed AS SELECT id AS k FROM range(3)")
      val q = spark.readStream.table("graft.feed")
        .writeStream.format("memory").queryName("cat_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("cat_stream").count() == 3, "initial snapshot")
        spark.sql("INSERT INTO graft.feed VALUES (10), (11)")
        q.processAllAvailable()
        val got = spark.table("cat_stream").collect().map(_.getLong(0)).toSet
        assert(got == Set(0L, 1L, 2L, 10L, 11L),
          s"appends must tail exactly-once: $got")
      } finally q.stop()
      // the change feed changes the schema — refused with a pointer
      val e = intercept[Exception] {
        spark.readStream.option("readChangeFeed", "true").table("graft.feed")
          .writeStream.format("memory").queryName("cat_cdf").start()
      }
      assert(e.getMessage.contains("readChangeFeed"), e.getMessage)
    }
  }

  test("CALL graft.system.*: maintenance verbs as stored procedures") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.mt AS SELECT id AS k FROM range(10)")
      spark.sql("INSERT INTO graft.mt SELECT id + 100 FROM range(5)")
      spark.sql("INSERT INTO graft.mt SELECT id + 200 FROM range(5)")
      // optimize: compacts the small files, returns the new version
      val vOpt = spark.sql(
        "CALL graft.system.optimize(table => 'mt')").head().getLong(0)
      assert(vOpt == 4L, s"optimize committed v$vOpt")
      assert(spark.sql("SELECT count(*) AS n FROM graft.mt").head().getLong(0) == 20L)
      // tag the compacted snapshot, restore to v1, vacuum dry-run first
      assert(spark.sql("CALL graft.system.tag(table => 'mt', name => 'compacted')")
        .head().getLong(0) == 4L)
      val vRestored = spark.sql(
        "CALL graft.system.restore(table => 'mt', version => 1)")
        .head().getLong(0)
      assert(vRestored == 5L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.mt").head().getLong(0) == 10L)
      val dry = spark.sql("CALL graft.system.vacuum(table => 'mt', " +
        "retain_versions => 1, dry_run => true)").head().getLong(0)
      val swept = spark.sql("CALL graft.system.vacuum(table => 'mt', " +
        "retain_versions => 1)").head().getLong(0)
      assert(dry == swept && swept >= 0L, s"dry=$dry swept=$swept")
      // tagged snapshot SURVIVES the vacuum (retention-pinned)
      assert(spark.sql("SELECT count(*) AS n FROM graft.mt VERSION AS OF 'compacted'")
        .head().getLong(0) == 20L)
      // bloom index builder returns the sidecar count
      assert(spark.sql("CALL graft.system.build_bloom_index(" +
        "table => 'mt', column => 'k')").head().getLong(0) >= 1L)
      assert(TxLog.readByKey(spark, s"$w/mt", "k", 3L).count() == 1)
    }
  }

  test("CALL graft.system.ann_build/ann_append: the ANN lifecycle end-to-end in SQL") {
    withWarehouse { _ =>
      val emb = graft.tables.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      emb.filter(col("vec_id") < 400).createOrReplaceTempView("ann_corpus")
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
        .createOrReplaceTempView("ann_batch")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_proc_ann").toString + "/idx"
      val nlist = spark.sql("CALL graft.system.ann_build(" +
        s"table => 'ann_corpus', index_path => '$idx', nlist => 8)")
        .head().getLong(0)
      assert(nlist == 8L, s"ann_build returned nlist=$nlist")
      val qv = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray.mkString(",")
      // query the freshly-built index through the TVF — pure SQL both ways
      val top = spark.sql(s"SELECT * FROM graft_ann('$idx', '$qv', 5, 8)")
        .collect()
      assert(top.length == 5 && top.head.getLong(0) == 0L,
        s"self must rank first: ${top.map(_.toString).mkString(", ")}")
      // append the new batch, then find one of ITS vectors
      val appended = spark.sql("CALL graft.system.ann_append(" +
        s"table => 'ann_batch', index_path => '$idx')").head().getLong(0)
      assert(appended == 50L, s"ann_append reported $appended rows")
      val qv2 = emb.filter(col("vec_id") === 425L)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray.mkString(",")
      val found = spark.sql(s"SELECT vec_id FROM graft_ann('$idx', '$qv2', 1, 8)")
        .head().getLong(0)
      assert(found == 425L, s"appended vector not served: got $found")
    }
  }

  test("one engine, three doors: Scala API, format mount, and graft.* SQL serve identical plans") {
    withWarehouse { w =>
      // a real testdata-backed table (orders slice), reached three ways
      val src = graft.tables.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Catalog.create(spark, "orders_d", src, statsCols = Seq("o_orderkey"))
      val bySql = spark.sql(
        "SELECT o_orderkey, o_totalprice FROM graft.orders_d " +
          "WHERE o_orderkey BETWEEN 100 AND 500")
      val byApi = Catalog.table(spark, "orders_d")
        .select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey").between(100, 500))
      val byFmt = spark.read.format("graft-txlog")
        .option("path", s"$w/orders_d").load()
        .select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey").between(100, 500))
      val rows = Seq(bySql, byApi, byFmt).map(
        _.orderBy("o_orderkey", "o_totalprice").collect().toSeq)
      assert(rows(0) == rows(1) && rows(1) == rows(2),
        "three doors must serve identical rows")
      assert(rows(0).nonEmpty)
      // identical PHYSICAL shape: same scan class, same pushed filters,
      // manifest-pruned file set (stats skip files outside the range)
      def scanLine(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.linesIterator
          .find(_.contains("Scan parquet")).getOrElse("NO SCAN")
      val scans = Seq(bySql, byApi, byFmt).map(scanLine)
      scans.foreach(l => assert(l.contains("PushedFilters") &&
        l.contains("GreaterThanOrEqual(o_orderkey,100)"),
        s"pushdown lost on a door:\n$l"))
      // the catalog door plans the SAME pruned file count as the mount
      def plannedFiles(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.listFiles(Nil, Nil).map(_.files.size.toLong).sum
        }.getOrElse(-1L)
      assert(plannedFiles(bySql) == plannedFiles(byFmt),
        s"catalog door must plan the mount's file set " +
          s"(${plannedFiles(bySql)} vs ${plannedFiles(byFmt)})")
    }
  }

  test("hidden-partition transforms in CREATE TABLE: bucket layout mounts bucketed") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.buck (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO graft.buck SELECT id AS k, CAST(id AS STRING) AS v " +
        "FROM range(100)")
      val m = TxLog.manifest(spark, s"$w/buck",
        TxLog.currentVersion(spark, s"$w/buck").get)
      assert(m.partitionSpec == Seq("bucket(4, k)"), m.partitionSpec.toString)
      assert(spark.sql("SELECT sum(k) AS s FROM graft.buck").head().getLong(0) == 4950L)
      // a self-join on the bucket key plans WITHOUT a shuffle exchange
      // on the scan side (the mount reports HashPartitioning)
      val j = spark.sql(
        "SELECT count(*) AS n FROM graft.buck a JOIN graft.buck b ON a.k = b.k")
      assert(j.head().getLong(0) == 100L)
    }
  }

  test("persistent views: survive a fresh session, plan with pushdown, full DDL loop") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.vbase (k BIGINT, seg STRING, amt DOUBLE) " +
        "PARTITIONED BY (seg)")
      spark.sql("INSERT INTO graft.vbase VALUES " +
        "(1, 'a', 10.0), (2, 'b', 20.0), (3, 'a', 30.0), (4, 'b', 40.0)")
      spark.sql("CREATE VIEW graft.vbig AS " +
        "SELECT k, amt * 2 AS amt2 FROM graft.vbase WHERE amt > 15.0")
      // the definition is REGISTRY state, not session state: a brand-new
      // session (fresh SessionState, same registry file) resolves it
      val s2 = spark.newSession()
      s2.conf.set("graft.catalog.warehouse", w)
      val out = s2.sql("SELECT * FROM graft.vbig ORDER BY k")
        .as[(Long, Double)](org.apache.spark.sql.Encoders.product[(Long, Double)])
        .collect().toSeq
      assert(out == Seq((2L, 40.0), (3L, 60.0), (4L, 80.0)), s"got $out")
      // reads through the view plan onto the V1 parquet mount with the
      // view's filter pushed into the scan
      val plan = spark.sql("SELECT k FROM graft.vbig").queryExecution
        .executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(amt,15.0)"), plan.take(2000))
      // nested views expand recursively; a cycle refuses loudly
      spark.sql("CREATE VIEW graft.vtop AS " +
        "SELECT count(*) AS n FROM graft.vbig")
      assert(spark.sql("SELECT n FROM graft.vtop").head().getLong(0) == 3L)
      // SHOW VIEWS sees the registry; DROP removes only the named view
      val shown = spark.sql("SHOW VIEWS IN graft").select("viewName")
        .as[String].collect().toSet
      assert(shown == Set("vbig", "vtop"), shown.toString)
      // CREATE OR REPLACE redefines in place
      spark.sql("CREATE OR REPLACE VIEW graft.vtop AS " +
        "SELECT count(*) + 100 AS n FROM graft.vbig")
      assert(spark.sql("SELECT n FROM graft.vtop").head().getLong(0) == 103L)
      // a table may not take a view's name, nor CTAS over it
      val e1 = intercept[Exception] {
        spark.sql("CREATE TABLE graft.vbig (x INT)") }
      assert(e1.getMessage.contains("vbig"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("CREATE OR REPLACE TABLE graft.vbig AS SELECT 1 AS x") }
      assert(e2.getMessage.contains("VIEW"), e2.getMessage)
      // the Scala-verb namespace refuses view names loudly
      val e3 = intercept[IllegalArgumentException] {
        Catalog.resolve(spark, "vbig") }
      assert(e3.getMessage.contains("VIEW"), e3.getMessage)
      spark.sql("DROP VIEW graft.vtop")
      assert(spark.sql("SHOW VIEWS IN graft").count() == 1L)
      // DROP VIEW on a missing name: IF EXISTS is quiet, bare is loud
      spark.sql("DROP VIEW IF EXISTS graft.vtop")
      intercept[Exception] { spark.sql("DROP VIEW graft.vtop") }
      spark.sql("DROP VIEW graft.vbig")
      assert(spark.sql("SHOW VIEWS IN graft").count() == 0L)
      // a column list applies as positional aliases over the body
      spark.sql("CREATE VIEW graft.vnamed (id, doubled) AS " +
        "SELECT k, amt * 2 FROM graft.vbase WHERE k <= 2")
      val named = spark.sql(
        "SELECT doubled FROM graft.vnamed WHERE id = 2").head().getDouble(0)
      assert(named == 40.0, named.toString)
      // arity mismatch refuses at create
      val e4 = intercept[Exception] {
        spark.sql("CREATE VIEW graft.vbad (a, b, c) AS " +
          "SELECT k FROM graft.vbase") }
      assert(e4.getMessage.contains("column list"), e4.getMessage)
      // DESCRIBE serves the stored declaration; EXTENDED adds the text
      val desc = spark.sql("DESCRIBE graft.vnamed").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(desc == Seq(("id", "bigint"), ("doubled", "double")), desc)
      val ext = spark.sql("DESCRIBE EXTENDED graft.vnamed").collect()
        .map(_.getString(0)).toSeq
      assert(ext.contains("View Text"), ext.toString)
      // ALTER VIEW AS redefines an existing view; a missing name refuses
      spark.sql("ALTER VIEW graft.vnamed AS " +
        "SELECT k AS id FROM graft.vbase WHERE k = 1")
      assert(spark.sql("SELECT id FROM graft.vnamed").head().getLong(0) == 1L)
      intercept[Exception] {
        spark.sql("ALTER VIEW graft.vmissing AS SELECT 1 AS x") }
      // SHOW VIEWS LIKE: SHOW-pattern grammar, metachars are literal
      assert(spark.sql("SHOW VIEWS IN graft LIKE 'vna*'").count() == 1L)
      assert(spark.sql("SHOW VIEWS IN graft LIKE 'v.amed'").count() == 0L)
      assert(spark.sql("SHOW VIEWS IN graft LIKE 'nope|vnamed'").count() == 1L)
    }
  }

  test("INSERT OVERWRITE keeps the declared schema DDL, nullability included") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE graft.nn (k BIGINT, v DOUBLE)")
      // the overwrite frame is all literals — non-nullable attributes;
      // the table's declared (nullable) contract must not tighten
      spark.sql("INSERT OVERWRITE graft.nn VALUES (9, 9.0)")
      spark.sql("INSERT INTO graft.nn VALUES (4, NULL)")
      val out = spark.sql("SELECT k, v FROM graft.nn ORDER BY k")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None
          else Some(r.getDouble(1)))).toSeq
      assert(out == Seq((4L, None), (9L, Some(9.0))), s"got $out")
    }
  }

  test("INSERT OVERWRITE and TRUNCATE work on hidden-partitioned tables") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.hidow (k BIGINT, v DOUBLE) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO graft.hidow VALUES (1, 1.0), (2, 2.0)")
      spark.sql("INSERT OVERWRITE graft.hidow VALUES (9, 9.0)")
      val out = spark.sql("SELECT k, v FROM graft.hidow")
        .as[(Long, Double)].collect().toSeq
      assert(out == Seq((9L, 9.0)), s"got $out")
      // the hidden layout survived the overwrite
      val m = TxLog.manifest(spark, s"$w/hidow",
        TxLog.currentVersion(spark, s"$w/hidow").get)
      assert(m.partitionSpec == Seq("bucket(4, k)"), m.partitionSpec.toString)
      spark.sql("TRUNCATE TABLE graft.hidow")
      assert(spark.sql("SELECT count(*) FROM graft.hidow").head().getLong(0) == 0L)
      spark.sql("INSERT INTO graft.hidow VALUES (3, 3.0)")
      assert(spark.sql("SELECT k FROM graft.hidow").head().getLong(0) == 3L)
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION: plain SQL widens and merges") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.msev (k BIGINT, amt DOUBLE)")
      spark.sql("INSERT INTO graft.msev VALUES (1, 10.0), (2, 20.0)")
      Seq((1L, 15.0, "gold"), (9L, 90.0, "silver"))
        .toDF("k", "amt", "tier").createOrReplaceTempView("msev_src")
      // without the clause, the extra source column refuses loudly
      val e = intercept[Exception] {
        spark.sql("MERGE INTO graft.msev t USING msev_src s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(e.getMessage.toLowerCase.contains("schema") ||
        e.getMessage.contains("tier"), e.getMessage)
      // WITH SCHEMA EVOLUTION: the analyzer ALTERs the new column in
      // through the catalog, then the merge lands it — UPDATE SET *
      // assigns it, INSERT * carries it whole, untouched rows read null
      spark.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO graft.msev t USING msev_src s " +
          "ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      val out = spark.sql(
        "SELECT k, amt, tier FROM graft.msev ORDER BY k")
        .as[(Long, Double, Option[String])].collect().toSeq
      assert(out == Seq(
        (1L, 15.0, Some("gold")),
        (2L, 20.0, None),
        (9L, 90.0, Some("silver"))), s"got $out")
      // the widened schema is durable catalog metadata
      assert(spark.table("graft.msev").columns.toSeq ==
        Seq("k", "amt", "tier"))
    }
  }

  test("TBLPROPERTIES through plain SQL: CREATE, SHOW, ALTER SET/UNSET, appendOnly enforcement") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.prot (k BIGINT, seg STRING, amt DOUBLE) " +
        "PARTITIONED BY (seg) " +
        "TBLPROPERTIES ('tier'='gold', 'graft.appendOnly'='true')")
      spark.sql("INSERT INTO graft.prot VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
      val shown = spark.sql("SHOW TBLPROPERTIES graft.prot")
        .as[(String, String)].collect().toMap
      assert(shown.get("tier").contains("gold") &&
        shown.get("graft.appendOnly").contains("true"), shown.toString)
      // the enforced switch refuses row removal through EVERY SQL door
      val eDel = intercept[Exception] {
        spark.sql("DELETE FROM graft.prot WHERE k = 1") }
      assert(eDel.getMessage.contains("graft.appendOnly"), eDel.getMessage)
      val eUpd = intercept[Exception] {
        spark.sql("UPDATE graft.prot SET amt = 0 WHERE k = 1") }
      assert(eUpd.getMessage.contains("graft.appendOnly"), eUpd.getMessage)
      val eOvw = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.prot VALUES (9, 'z', 0.0)") }
      assert(eOvw.getMessage.contains("graft.appendOnly"), eOvw.getMessage)
      // appends stay open; UNSET re-opens the rest
      spark.sql("INSERT INTO graft.prot VALUES (3, 'a', 30.0)")
      spark.sql("ALTER TABLE graft.prot UNSET TBLPROPERTIES ('graft.appendOnly')")
      spark.sql("DELETE FROM graft.prot WHERE k = 1")
      assert(spark.sql("SELECT count(*) AS n FROM graft.prot")
        .head().getLong(0) == 2L)
      // SET re-arms it
      spark.sql("ALTER TABLE graft.prot SET TBLPROPERTIES " +
        "('graft.appendOnly'='true')")
      val eAgain = intercept[Exception] {
        spark.sql("DELETE FROM graft.prot WHERE k = 2") }
      assert(eAgain.getMessage.contains("graft.appendOnly"), eAgain.getMessage)
      // reserved keys refuse loudly
      val eRes = intercept[Exception] {
        spark.sql("ALTER TABLE graft.prot SET TBLPROPERTIES " +
          "('location'='/tmp/elsewhere')") }
      assert(eRes.getMessage.contains("reserved"), eRes.getMessage)
      // the TVF window into the same state
      val tvf = spark.sql(
        s"SELECT * FROM graft_txlog_properties('$w/prot')")
        .as[(String, String)].collect().toMap
      assert(tvf.get("graft.appendOnly").contains("true") &&
        tvf.get("tier").contains("gold"), tvf.toString)
      // properties do NOT leak into the constraints listing
      val cons = spark.sql(
        s"SELECT name FROM graft_txlog_constraints('$w/prot')")
        .as[String].collect()
      assert(!cons.exists(_.contains("prop")), cons.mkString(", "))
    }
  }

  test("CREATE TABLE ... CLUSTER BY declares the clustering property; bare OPTIMIZE honors it") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.lc (k BIGINT, v DOUBLE) CLUSTER BY (k, v)")
      assert(TxLog.propertiesOf(spark, s"$w/lc")
        .get(TxLog.ZorderColsProp).contains("k,v"),
        "CLUSTER BY must land as the declared-clustering property")
      // clustering is an axis, not a partition layout
      assert(TxLog.manifest(spark, s"$w/lc", 1L).partitionCols.isEmpty)
      spark.sql("INSERT INTO graft.lc SELECT id, id * 1.0 FROM range(100)")
      spark.sql("INSERT INTO graft.lc SELECT id + 100, id * 1.0 FROM range(100)")
      // a bare OPTIMIZE resolves the declared clustering (no explicit cols)
      val v = spark.sql("CALL graft.system.optimize(table => 'lc')")
        .head().getLong(0)
      import spark.implicits._
      val op = TxLog.history(spark, s"$w/lc")
        .filter(col("version") === v).select("operation").as[String].head()
      assert(op.contains("ZORDER BY k, v"),
        s"bare OPTIMIZE did not resolve the declaration: $op")
      // CTAS path declares too
      spark.sql("CREATE TABLE graft.lc2 CLUSTER BY (k) AS " +
        "SELECT id AS k, id * 2.0 AS v FROM range(10)")
      assert(TxLog.propertiesOf(spark, s"$w/lc2")
        .get(TxLog.ZorderColsProp).contains("k"))
    }
  }

  test("CREATE TABLE with an invalid TBLPROPERTIES key refuses with NOTHING written") {
    withWarehouse { w =>
      // '__'-prefixed keys are reserved for the engine's own channel —
      // the refusal must come BEFORE any commit, so no
      // committed-but-unregistered dir leaks (r14 advice)
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE graft.badprop (k BIGINT) " +
          "TBLPROPERTIES ('__secret'='x')")
      }
      assert(e.getMessage.contains("__"), e.getMessage)
      assert(!new java.io.File(s"$w/badprop").exists(),
        "a refused CREATE must leave no table directory behind")
      assert(!spark.catalog.tableExists("graft.badprop"))
      // column-LIST properties validate against the schema pre-create
      // too (r15 advice: the schema-free check alone still leaked a
      // committed-but-unregistered dir for a bogus graft.bloomCols)
      val e2 = intercept[Exception] {
        spark.sql("CREATE TABLE graft.badcols (k BIGINT) " +
          "TBLPROPERTIES ('graft.bloomCols'='bogus')")
      }
      assert(e2.getMessage.contains("bogus"), e2.getMessage)
      assert(!new java.io.File(s"$w/badcols").exists(),
        "a refused column-list CREATE must leave no table directory behind")
      assert(!spark.catalog.tableExists("graft.badcols"))
      // and the CTAS door refuses before the SELECT runs
      val e3 = intercept[Exception] {
        spark.sql("CREATE TABLE graft.badctas " +
          "TBLPROPERTIES ('graft.zorderCols'='nope') AS SELECT 1 AS k")
      }
      assert(e3.getMessage.contains("nope"), e3.getMessage)
      assert(!new java.io.File(s"$w/badctas").exists())
    }
  }

  test("SHOW CREATE TABLE renders schema, partitioning and TBLPROPERTIES") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE graft.sct (k BIGINT, seg STRING) " +
        "PARTITIONED BY (seg) TBLPROPERTIES ('tier'='gold')")
      val stmt = spark.sql("SHOW CREATE TABLE graft.sct").head().getString(0)
      assert(stmt.contains("graft.sct") && stmt.contains("k BIGINT") &&
        stmt.contains("PARTITIONED BY (seg)") &&
        stmt.contains("tier") && stmt.contains("gold"), stmt)
    }
  }

  test("CTAS with TBLPROPERTIES stages them; COMMENT ON TABLE rides the property channel") {
    withWarehouse { w =>
      spark.sql("CREATE TABLE graft.ctp TBLPROPERTIES ('tier'='bronze') " +
        "AS SELECT CAST(id AS BIGINT) AS k FROM range(5)")
      val shown = spark.sql("SHOW TBLPROPERTIES graft.ctp")
        .as[(String, String)].collect().toMap
      assert(shown.get("tier").contains("bronze"), shown.toString)
      spark.sql("COMMENT ON TABLE graft.ctp IS 'five rows of k'")
      // SHOW TBLPROPERTIES hides Spark's RESERVED keys (comment among
      // them) — the engine's own listing is the visibility check
      val props = TxLog.propertiesOf(spark, s"$w/ctp")
      assert(props.get("comment").contains("five rows of k"), props.toString)
      assert(spark.sql("DESCRIBE TABLE EXTENDED graft.ctp")
        .filter($"col_name" === "Comment").select("data_type")
        .as[String].collect().toSeq == Seq("five rows of k"),
        "DESCRIBE EXTENDED surfaces the comment")
      // RTAS is a redefinition: the property set resets to the staged one
      spark.sql("REPLACE TABLE graft.ctp TBLPROPERTIES ('tier'='silver') " +
        "AS SELECT CAST(id AS BIGINT) AS k FROM range(3)")
      val props3 = TxLog.propertiesOf(spark, s"$w/ctp")
      assert(props3 == Map("tier" -> "silver"), props3.toString)
    }
  }
}
