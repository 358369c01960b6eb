package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VARIANT columns through the lake (Spark 4 VariantType): the typed
  * answer to stringly-JSON columns. Pins the deliberate contract —
  * the manifest's schema-DDL round trip carries VARIANT, appends and
  * version-pinned reads preserve the payload byte-for-byte (compared
  * through to_json), predicates read through `variant_get` (DV deletes
  * included), the change feed carries the variant payload, schema
  * evolution adds variant columns with null backfill, and min/max
  * stats on a variant column refuse loudly (there is no meaningful
  * order to prune by). */
class TxLogVariantSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_var_$tag").toString + "/t"

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "js").select(col("id"), parse_json(col("js")).as("v"))
  }

  test("create/append/read round trip: VariantType survives the manifest DDL") {
    val path = fresh("rt")
    TxLog.create(mk(Seq((1L, """{"k":5,"tags":["a","b"]}"""))), path)
    TxLog.append(mk(Seq((2L, """{"k":7,"nested":{"x":1.5}}"""))), path)
    val got = TxLog.read(spark, path)
    assert(got.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType, got.schema.toDDL)
    val js = got.select(col("id"), to_json(col("v")).as("j"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(js(1L) == """{"k":5,"tags":["a","b"]}""", js.toString)
    assert(js(2L) == """{"k":7,"nested":{"x":1.5}}""", js.toString)
    // typed extraction down arbitrary paths
    val x = got.filter(col("id") === 2L)
      .select(expr("variant_get(v, '$.nested.x', 'double')")).head().getDouble(0)
    assert(x == 1.5)
  }

  test("DV delete through variant_get; the change feed carries the variant payload") {
    val path = fresh("dv")
    TxLog.create(mk(Seq((1L, """{"k":1}"""), (2L, """{"k":2}"""),
      (3L, """{"k":3}"""))), path)                                  // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                      // v2
    TxLog.deleteWhere(spark, path,
      expr("variant_get(v, '$.k', 'int')") === 2,
      deletionVectors = true)                                       // v3
    assert(TxLog.read(spark, path).count() == 2L)
    val feed = TxLog.changeFeed(spark, path, 2L, 3L)
      .select(col("_change_type"), col("id"), to_json(col("v")).as("j"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(feed.toSeq == Seq(("delete", 2L, """{"k":2}""")), feed.toSeq)
    // and a restore across the variant DV flips it back, payload intact
    TxLog.restore(spark, path, 2L)                                  // v4
    val flip = TxLog.changeFeed(spark, path, 3L, 4L)
      .select(col("_change_type"), col("id"), to_json(col("v")).as("j"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(flip.toSeq == Seq(("insert", 2L, """{"k":2}""")), flip.toSeq)
  }

  test("schema evolution: ADD COLUMN variant backfills null; old versions keep their schema") {
    val path = fresh("evolve")
    TxLog.create(Seq((1L, "a")).toDF("id", "s"), path)              // v1
    TxLog.addColumn(spark, path, "meta", "variant")                 // v2
    TxLog.append(Seq((2L, "b", """{"m":1}"""))
      .toDF("id", "s", "js")
      .select(col("id"), col("s"), parse_json(col("js")).as("meta")),
      path)                                                         // v3
    val got = TxLog.read(spark, path)
      .select(col("id"), to_json(col("meta")).as("j"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got == Map(1L -> None, 2L -> Some("""{"m":1}""")), got.toString)
    assert(!TxLog.read(spark, path, Some(1L)).columns.contains("meta"),
      "version-pinned reads keep their own schema")
  }

  test("SHREDDED variant writes round-trip through the lake (Spark 4 parquet shredding)") {
    // shredding stores a variant's common paths as real parquet
    // columns (typed, stats-bearing) next to the binary remainder —
    // the scale posture for variant-heavy lakes. Session-conf scoped:
    // writers opt in, readers opt in; the lake machinery (manifest
    // DDL, DV deletes, version pins) is agnostic to the file encoding.
    val path = fresh("shred")
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    spark.conf.set("spark.sql.variant.allowReadingShredded", "true")
    try {
      TxLog.create(mk(Seq((1L, """{"k":5,"s":"x"}"""),
        (2L, """{"k":7,"s":"y"}"""))), path)
      TxLog.append(mk(Seq((3L, """{"k":9,"s":"z"}"""))), path)
      TxLog.deleteWhere(spark, path,
        expr("variant_get(v, '$.k', 'int')") === 7,
        deletionVectors = true)
      val got = TxLog.read(spark, path)
        .select(col("id"), expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("variant_get(v, '$.s', 'string')").as("s"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == Set((1L, 5, "x"), (3L, 9, "z")), got.toString)
      // the files really are shredded: the parquet footer carries the
      // typed_value group, not just the binary value column
      val dataDir = new java.io.File(s"$path/data")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      val pq = walk(dataDir).filter(_.getName.endsWith(".parquet"))
      assert(pq.nonEmpty)
      // Spark re-surfaces VariantType regardless of encoding — the
      // PHYSICAL message type in the parquet footer is the witness:
      // shredded = a typed_value field beside the binary value
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(pq.head.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration))
      val physical =
        try footer.getFileMetaData.getSchema.toString
        finally footer.close()
      assert(physical.contains("typed_value"),
        s"expected a shredded physical layout:\n$physical")
    } finally {
      spark.conf.unset("spark.sql.variant.writeShredding.enabled")
      spark.conf.unset("spark.sql.variant.inferShreddingSchema")
      spark.conf.unset("spark.sql.variant.allowReadingShredded")
    }
  }

  test("variant-path skipping: 'v:$.k' stats prune a clustered table to the matching files") {
    // r17 verdict #8: shredded writes store common paths as typed,
    // stats-bearing parquet columns — this is the manifest-side
    // pairing. Four appends, each a file covering a disjoint $.k
    // decade; a narrow range plans ONLY the matching file, and the
    // default-double and explicit-bigint spellings agree.
    val path = fresh("skip")
    def decade(lo: Long) =
      mk((lo until lo + 10L).map(k => (k, s"""{"k":$k,"s":"x$k"}""")))
        .coalesce(1) // one file per decade: the clustered layout under test
    TxLog.create(decade(0L), path,
      statsCols = Seq("v:$.k", "v:$.s:string"))
    Seq(10L, 20L, 30L).foreach(lo => TxLog.append(decade(lo), path))
    val m = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get)
    assert(m.files.length == 4, m.files.toString)
    // every file carries bounds for the declared paths
    assert(m.files.forall(f => m.fileStats.get(f).exists(_.contains("v:$.k"))),
      m.fileStats.toString)
    val pruned = TxLog.prunedFiles(spark, path, "v:$.k", 12L, 17L)
    assert(pruned.length == 1,
      s"narrow $$.k range must plan one file of four, got $pruned")
    val got = TxLog.readBetween(spark, path, "v:$.k", 12L, 17L)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(12L to 17L), got.mkString(","))
    // string-typed path prunes lexicographically within its decade
    val prunedS = TxLog.prunedFiles(spark, path, "v:$.s:string", "x12", "x17")
    assert(prunedS.length < 4, s"string path stats must vote: $prunedS")
    // an untracked path never prunes (fail-open)
    assert(TxLog.prunedFiles(spark, path, "v:$.nope", 0L, 1L).length == 4)
  }

  test("variant-path skipping through SHREDDED writes (typed_value pages serve the stats)") {
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    spark.conf.set("spark.sql.variant.allowReadingShredded", "true")
    try {
      val path = fresh("shredskip")
      def decade(lo: Long) =
        mk((lo until lo + 10L).map(k => (k, s"""{"k":$k}"""))).coalesce(1)
      TxLog.create(decade(0L), path, statsCols = Seq("v:$.k:bigint"))
      Seq(10L, 20L).foreach(lo => TxLog.append(decade(lo), path))
      val pruned = TxLog.prunedFiles(spark, path, "v:$.k:bigint", 21L, 25L)
      assert(pruned.length == 1,
        s"shredded files must carry path bounds, got $pruned")
      val got = TxLog.readBetween(spark, path, "v:$.k:bigint", 21L, 25L)
        .select(col("id")).collect().map(_.getLong(0)).sorted
      assert(got.sameElements(21L to 25L), got.mkString(","))
    } finally {
      spark.conf.unset("spark.sql.variant.writeShredding.enabled")
      spark.conf.unset("spark.sql.variant.inferShreddingSchema")
      spark.conf.unset("spark.sql.variant.allowReadingShredded")
    }
  }

  test("variant-path stats declarations validate loudly") {
    val df = mk(Seq((1L, """{"k":1}""")))
    val badType = intercept[Exception] {
      TxLog.create(df, fresh("badtype"), statsCols = Seq("v:$.k:garbage"))
    }
    assert(badType.getMessage.contains("garbage"), badType.getMessage)
    val notVariant = intercept[Exception] {
      TxLog.create(df, fresh("notvar"), statsCols = Seq("id:$.k:bigint"))
    }
    assert(notVariant.getMessage.contains("VARIANT"), notVariant.getMessage)
    val noCol = intercept[Exception] {
      TxLog.create(df, fresh("nocol"), statsCols = Seq("w:$.k"))
    }
    assert(noCol.getMessage.contains("'w'"), noCol.getMessage)
  }

  test("min/max stats on a variant column refuse loudly") {
    val path = fresh("stats")
    val e = intercept[Exception] {
      TxLog.create(mk(Seq((1L, """{"k":1}"""))), path,
        statsCols = Seq("v"))
    }
    assert(Option(e.getMessage).exists(m =>
      m.toLowerCase.contains("variant") || m.contains("v")),
      s"refusal must name the column or type: ${e.getMessage}")
  }
}
