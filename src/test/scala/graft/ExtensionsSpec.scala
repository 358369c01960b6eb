package graft

class ExtensionsSpec extends SparkSpec {

  test("graft expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c""".stripMargin)
      .head()
    // rolling hash: ((0*p + 'a')*p + 'b')*p + 'c' with p = 1315423911
    val p = 1315423911L
    val expected = (('a'.toLong * p + 'b') * p + 'c')
    assert(r.getLong(0) == expected)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("r7 SQL surface: image_header parses crafted PNG bytes, word_shingles shingles") {
    GraftExtensions.register(spark)
    val pngHex = graft.queries.PipelineQueries.pngHex(640, 480)
    val r = spark.sql(
      s"""SELECT image_header(unhex('$pngHex')) AS hdr,
         |       image_header(unhex('DEADBEEF')) AS bad,
         |       word_shingles('a b c', 2) AS sh""".stripMargin).head()
    val hdr = r.getStruct(0)
    assert(hdr.getString(0) == "png" && hdr.getInt(1) == 640 && hdr.getInt(2) == 480)
    assert(r.isNullAt(1), "garbage bytes must parse to null")
    assert(r.getSeq[String](2).toSet == Set("a b", "b c"))
  }

  test("vec_dot/vec_cosine null on corrupt input: length mismatch and null elements") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D)) AS mism,
        |       vec_cosine(array(1.0D, 2.0D), array(3.0D, 4.0D, 5.0D)) AS mism2,
        |       vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS nel,
        |       vec_cosine(array(1.0D, 2.0D), array(CAST(NULL AS DOUBLE), 4.0D)) AS nel2,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS narr""".stripMargin)
      .head()
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"column $i should be NULL"))
    // literals above are constant-folded (interpreted eval); force the
    // CODEGEN path with a non-foldable column-dependent input
    val gen = spark.range(3).selectExpr(
      "id",
      """CASE WHEN id = 0 THEN array(1.0D, 2.0D)
        |     WHEN id = 1 THEN array(3.0D)
        |     ELSE array(CAST(NULL AS DOUBLE), 4.0D) END AS a""".stripMargin,
      "array(5.0D, 6.0D) AS b")
      .selectExpr("id", "vec_dot(a, b) AS d", "vec_cosine(a, b) AS c")
      .orderBy("id")
      .collect()
    assert(gen(0).getDouble(1) == 17.0 && !gen(0).isNullAt(2)) // well-formed
    assert(gen(1).isNullAt(1) && gen(1).isNullAt(2))           // length mismatch
    assert(gen(2).isNullAt(1) && gen(2).isNullAt(2))           // null element
  }

  test("q_approx_distinct: every per-group bound flag TRUE (sketch within 10% of exact)") {
    // the 5%-of-exact check moved INTO the query as bound_ok (r17
    // bound-checked gate, 10% = 5× the configured rsd); here: the
    // flag holds for every group and the exact column is sane
    val rows = queries.WarehouseQueries.approxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"suppkey ${r.get(0)}: sketch out of bound (exact ${r.getLong(1)})")
      assert(r.getLong(1) > 0)
    }
  }

  test("q_distinct_count: distinct never exceeds row count") {
    val bad = queries.WarehouseQueries.distinctCount(spark, sf)
      .filter(org.apache.spark.sql.functions.col("n_parts") >
        org.apache.spark.sql.functions.col("n_rows")).count()
    assert(bad == 0)
  }
}
