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

  test("q_approx_distinct sketch stays within 5% of exact counts") {
    val rows = queries.WarehouseQueries.approxDistinct(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"suppkey ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("q_distinct_count: distinct never exceeds row count") {
    val bad = queries.WarehouseQueries.distinctCount(spark, sf)
      .filter(org.apache.spark.sql.functions.col("n_parts") >
        org.apache.spark.sql.functions.col("n_rows")).count()
    assert(bad == 0)
  }
}
