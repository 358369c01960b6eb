package graft

import org.apache.spark.sql.functions._

import graft.gwas.GwasOps

class GwasOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mafCalc matches the reference formula (het + 2*hom1) / (2*total)") {
    val d = Seq(("10/20/70", 0.2), ("0/0/100", 0.0), ("100/0/0", 1.0))
      .toDF("geno", "expected")
    val bad = d.withColumn("maf", GwasOps.mafCalc(col("geno")))
      .filter(col("maf") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("kgp id round-trips through allele extraction") {
    val d = Seq((1, 10505, "A", "T"), (22, 999, "CAG", "G"))
      .toDF("chr", "pos", "ref", "alt")
      .withColumn("kgp", GwasOps.kgpId(col("chr"), col("pos"), col("ref"), col("alt")))
    val bad = d.filter(
      GwasOps.refFromKgp(col("kgp")) =!= col("ref") ||
        GwasOps.altFromKgp(col("kgp")) =!= col("alt")).count()
    assert(bad == 0)
  }

  test("stripIdSuffix removes ,NNN composites like the reference load") {
    val d = Seq(("1:10505_A_T,123", "1:10505_A_T"), ("2:5_G_C", "2:5_G_C"))
      .toDF("in", "expected")
    val bad = d.filter(GwasOps.stripIdSuffix(col("in")) =!= col("expected")).count()
    assert(bad == 0)
  }

  test("pivotHwe widens ALL/AFF/UNAFF rows with all five reference value groups") {
    val long = Seq(
      (22, "rs1", "A", "T", "ALL", "10/20/70", 0.20, 0.18, 0.5),
      (22, "rs1", "A", "T", "AFF", "5/10/35", 0.21, 0.19, 0.4),
      (22, "rs1", "A", "T", "UNAFF", "5/10/35", 0.22, 0.20, 0.6)
    ).toDF("chr", "snp", "a1", "a2", "test", "geno", "o_het", "e_het", "p")
    val wide = GwasOps.pivotHwe(long)
    assert(wide.count() == 1)
    // the reference pivots values_from = c(geno, o_het, e_het, p, maf)
    // (wrangle_data.Rmd:210,316) — all five groups × three tests
    for (t <- Seq("ALL", "AFF", "UNAFF"); v <- Seq("geno", "o_het", "e_het", "hwe_p", "maf"))
      assert(wide.columns.contains(s"${t}_$v"), s"missing pivot column ${t}_$v")
    val r = wide.head()
    assert(r.getAs[String]("ALL_geno") == "10/20/70")
    assert(r.getAs[Double]("ALL_o_het") == 0.20)
    assert(r.getAs[Double]("AFF_e_het") == 0.19)
    assert(r.getAs[Double]("AFF_hwe_p") == 0.4)
    assert(math.abs(r.getAs[Double]("UNAFF_maf") - 0.2) < 1e-12)
  }

  test("resolveMarkerIds prefers marker kgp_id for rs/Affx names and strips suffixes") {
    val marker = Seq(
      ("1:100_A_T", "rs100"),
      ("2:200_G_C", "Affx-200")
    ).toDF("kgp_id", "marker_name")
    val load = Seq(
      (1L, "rs100", "rs100", "A", "T"),          // rs, alleles match → marker kgp_id
      (2L, "rs100", "rs100", "T", "T"),          // rs, allele mismatch → NULL (reference NA)
      (3L, "Affx-200", "Affx-200", "G", "C"),    // Affx name resolved
      (4L, "rs999", "3:300_C_G", "C", "G"),      // positional id kept as-is
      (5L, "rs998", "3:301_C_G,456", "C", "G")   // ,NNN composite suffix stripped
    ).toDF("row_id", "snp_id", "chr_pos_alleles", "ref", "alt")
    val got = GwasOps.resolveMarkerIds(load, marker)
      .select("row_id", "kgp_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("1:100_A_T"))
    assert(got(2L).isEmpty)
    assert(got(3L).contains("2:200_G_C"))
    assert(got(4L).contains("3:300_C_G"))
    assert(got(5L).contains("3:301_C_G"))
  }

  test("resolveMarkerIds chrXY mode applies the X: -> XY: fixup") {
    val marker = Seq(("X:1_A_T", "rsX")).toDF("kgp_id", "marker_name")
    val load = Seq((1L, "rsX", "X:1_A_T", "A", "T"))
      .toDF("row_id", "snp_id", "chr_pos_alleles", "ref", "alt")
    val got = GwasOps.resolveMarkerIds(load, marker, chrXY = true)
      .select("kgp_id").head().getString(0)
    assert(got == "XY:1_A_T")
  }

  test("qcSplit partitions rows on info score and maf thresholds") {
    val g = Seq(
      ("m1", 1, 0.9, 0.3),   // keeps
      ("m2", 1, 0.1, 0.3),   // low info
      ("m3", 1, 0.9, 1e-6)   // low maf
    ).toDF("kgp_id", "study_id", "impute_score", "maf_all")
    val (kept, removed) = GwasOps.qcSplit(g)
    assert(kept.count() == 1)
    assert(removed.select("kgp_id").as[String].collect().toSet == Set("m2", "m3"))
  }

  test("combinedView applies the impute filter and joins study metadata") {
    val gwas = Seq(
      ("1:1_A_T", 1, 0.9, 5.5),
      ("1:2_G_C", 1, 0.1, 7.0)  // filtered: impute < 0.3
    ).toDF("kgp_id", "study_id", "impute_score", "neg_log10_p")
    val b37 = Seq(("1:1_A_T", 1, 1), ("1:2_G_C", 1, 2)).toDF("kgp_id", "chr", "pos")
    val study = Seq((1, "ukbb_gout", "european", 332370L, 7131L, 325239L))
      .toDF("id", "name", "ancestry", "n", "n_case", "n_control")
    val v = GwasOps.combinedView(gwas, b37, study)
    assert(v.count() == 1)
    val r = v.head()
    assert(r.getAs[String]("name") == "ukbb_gout")
    // ancestry rides the reduced study join — app.R's facet_grid
    // (ancestry ~ name) needs it in the view
    assert(r.getAs[String]("ancestry") == "european")
    assert(r.getAs[Int]("pos") == 1)
  }

  test("no_gwas_result audit feed persists removed pairs and orphans, append per load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nogwas").toString + "/no_gwas_result"
    val g = Seq(
      ("m1", 1, 0.9, 0.3),  // keeps
      ("m2", 1, 0.1, 0.3),  // low info -> removed
      ("m3", 1, 0.9, 1e-6)  // low maf -> removed
    ).toDF("kgp_id", "study_id", "impute_score", "maf_all")
    val (_, removed) = GwasOps.qcSplit(g)
    GwasOps.appendNoGwasResult(removed, dir)
    // second load: an orphan (kgp_id absent from b37) joins the feed
    val load2 = Seq(("m9", 2), ("m1", 2)).toDF("kgp_id", "study_id")
    val b37 = Seq(("m1", 1, 1)).toDF("kgp_id", "chr", "pos")
    GwasOps.appendNoGwasResult(GwasOps.orphans(load2, b37), dir)
    val stored = GwasOps.readNoGwasResult(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(stored == Set(("m2", 1), ("m3", 1), ("m9", 2)), s"stored was $stored")
  }

  test("locusWindow keeps only markers within the half-window on the same chr") {
    val b37 = Seq(
      ("m0", 1, 100000), ("near", 1, 105000), ("far", 1, 200000), ("othchr", 2, 100001)
    ).toDF("kgp_id", "chr", "pos")
    val got = GwasOps.locusWindow(b37, b37, "m0").select("kgp_id")
      .as[String].collect().toSet
    assert(got == Set("m0", "near"))
  }

  test("regionQuery, markerSearch and chrCounts match the app semantics") {
    val b37 = Seq(
      ("1:100_A_T", 1, 100), ("1:900_G_C", 1, 900), ("2:100_A_G", 2, 100),
      ("rs77_alias", 1, 500)
    ).toDF("kgp_id", "chr", "pos")
    assert(GwasOps.regionQuery(b37, chr = 1, start = 50, end = 600)
      .select("kgp_id").as[String].collect().toSet == Set("1:100_A_T", "rs77_alias"))
    assert(GwasOps.markerSearch(b37, "^rs").select("kgp_id").as[String]
      .collect().sameElements(Array("rs77_alias")))
    assert(GwasOps.chrCounts(b37).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      == Map(1 -> 3L, 2 -> 1L))
  }

  test("negLog10P matches -log10") {
    val d = Seq(0.01, 1.0).toDF("p")
    val got = d.select(GwasOps.negLog10P(col("p"))).as[Double].collect()
    assert(got(0) == 2.0 && got(1) == 0.0)
  }

  test("fixXYIds rewrites only the X: prefix, like the reference's sed pass") {
    val d = Seq(("X:1_A_T", "XY:1_A_T"), ("XY:2_G_C", "XY:2_G_C"), ("1:3_X:_A", "1:3_X:_A"))
      .toDF("in", "expected")
    assert(d.filter(GwasOps.fixXYIds(col("in")) =!= col("expected")).count() == 0)
  }

  test("salted join equals the plain join on a skewed key") {
    import graft.operators.Joins
    val skewed = (1 to 5000).map(i => (if (i % 10 == 0) 2L else 1L, i))
      .toDF("k", "v") // 90% of rows share k=1
    val dim = Seq((1L, "one"), (2L, "two")).toDF("dk", "name")
    val salted = Joins.saltedJoin(skewed, dim, "k", "dk")
      .select("k", "v", "name")
    val plain = skewed.join(dim, col("k") === col("dk")).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.select(sum("v")).head().getLong(0) ==
      plain.select(sum("v")).head().getLong(0))
  }

  test("saltedJoin shuffles on (key, salt) when the dim can't broadcast") {
    import graft.operators.Joins
    // force the shuffled path: at scale the dim wouldn't broadcast and
    // the salt must be part of the partitioning or the hot key still
    // lands on one reducer
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val skewed = (1 to 100).map(i => (1L, i)).toDF("k", "v")
      val dim = Seq((1L, "one")).toDF("dk", "name")
      val plan = Joins.saltedJoin(skewed, dim, "k", "dk")
        .queryExecution.sparkPlan
      // the equi-join keys drive EnsureRequirements' hashpartitioning:
      // _salt among them means the shuffle spreads the hot key
      val joinKeys = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.leftKeys.map(_.sql)
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.leftKeys.map(_.sql)
      }
      assert(joinKeys.nonEmpty, s"no shuffled join in plan:\n$plan")
      assert(joinKeys.forall(_.exists(_.contains("_salt"))),
        s"join keys not salted: $joinKeys")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("orphans finds load rows missing from b37") {
    val load = Seq(("a", 1), ("b", 1)).toDF("kgp_id", "study_id")
    val b37 = Seq(("a", 1, 1)).toDF("kgp_id", "chr", "pos")
    val got = GwasOps.orphans(load, b37).select("kgp_id").as[String].collect()
    assert(got.sameElements(Array("b")))
  }
}
