package graft

import org.apache.spark.sql.functions._

import graft.gwas.GwasViews
import graft.queries.ReferenceQueries

/** The SQL front door: registered views must serve the same results as
  * the DataFrame API — the reference's app.R queries as one-liners. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("oracle SQL for q_region_filter runs verbatim through the registered views") {
    graft.tools.Sql.registerAll(spark, sf)
    val viaSql = spark.sql(ReferenceQueries.oracles("q_region_filter")).collect()
    val viaDf = ReferenceQueries.entries("q_region_filter")(spark, sf).collect()
    assert(viaSql.length == viaDf.length && viaSql.nonEmpty)
    assert(viaSql.map(_.toString).toSeq == viaDf.map(_.toString).toSeq)
  }

  test("gwasDB views serve app.R's region and marker queries as SQL") {
    val b37 = Seq(
      ("1:100_A_T", 1, 100, "A", "T"),
      ("1:500_G_C", 1, 500, "G", "C"),
      ("2:100_A_G", 2, 100, "A", "G")
    ).toDF("kgp_id", "chr", "pos", "ref", "alt")
    val marker = Seq(("1:100_A_T", "rs100")).toDF("kgp_id", "marker_name")
    val study = Seq(
      (1, "ukbb_gout", "european", 1000L, 100L, 900L),
      (2, "kp_gout", "polynesian", 500L, 50L, 450L)
    ).toDF("id", "name", "ancestry", "n", "n_case", "n_control")
    val gwas = Seq(
      ("1:100_A_T", 1, 0.9, 5.5),
      ("1:500_G_C", 2, 0.95, 2.2),
      ("2:100_A_G", 1, 0.1, 1.0) // filtered by the view's impute QC
    ).toDF("kgp_id", "study_id", "impute_score", "neg_log10_p")
    GwasViews.register(spark, b37, marker, study, gwas)
    val region = spark.sql(GwasViews.regionSql(1, 50, 600))
      .select("kgp_id").as[String].collect().toSet
    assert(region == Set("1:100_A_T", "1:500_G_C"))
    val search = spark.sql(GwasViews.markerSearchSql("^1:"))
      .select("kgp_id").as[String].collect().toSet
    assert(search == Set("1:100_A_T", "1:500_G_C"))
    // the combined view carries the study join like the export view
    assert(spark.sql("SELECT DISTINCT name FROM combined WHERE name IS NOT NULL")
      .as[String].collect().toSet == Set("ukbb_gout", "kp_gout"))
    // app.R's facet_grid(ancestry ~ name) option: the facet dimensions
    // must group straight off the combined view
    val facets = spark.sql(
      """SELECT ancestry, name, count(*) AS n_hits
        |FROM combined GROUP BY ancestry, name ORDER BY ancestry, name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(facets == Seq(("european", "ukbb_gout", 1L), ("polynesian", "kp_gout", 1L)),
      s"facets were $facets")
  }

  test("no_gwas_result view serves the persisted QC audit feed by its reference name") {
    import graft.gwas.GwasOps
    val dir = java.nio.file.Files.createTempDirectory("graft_nogwas_view").toString + "/no_gwas_result"
    val g = Seq(
      ("m1", 1, 0.9, 0.3), ("m2", 1, 0.1, 0.3), ("m3", 1, 0.9, 1e-6)
    ).toDF("kgp_id", "study_id", "impute_score", "maf_all")
    val (_, removed) = GwasOps.qcSplit(g)
    GwasOps.appendNoGwasResult(removed, dir)
    val b37 = Seq(("m1", 1, 1)).toDF("kgp_id", "chr", "pos")
    val marker = Seq(("m1", "rs1")).toDF("kgp_id", "marker_name")
    val study = Seq((1, "s", "european", 10L, 1L, 9L))
      .toDF("id", "name", "ancestry", "n", "n_case", "n_control")
    GwasViews.register(spark, b37, marker, study, g,
      noGwasResult = Some(GwasOps.readNoGwasResult(spark, dir)))
    val got = spark.sql("SELECT kgp_id, study_id FROM no_gwas_result ORDER BY kgp_id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("m2", 1), ("m3", 1)), s"view served $got")
  }

  test("predicates pushed through a view reach the parquet scan") {
    graft.tools.Sql.registerAll(spark, sf)
    val p = spark.sql(
      "SELECT l_orderkey FROM lineitem WHERE l_suppkey = 5 AND l_partkey BETWEEN 50 AND 150")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_suppkey)"), s"no pushdown through view:\n$p")
  }
}
