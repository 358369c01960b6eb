package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gwas.GwasOps
import graft.tables.Tables._
import Det._

/** The gwasDB reference surface (SURVEY §2a), re-expressed Spark-first on
  * the driver's test tables.
  *
  * Mapping: `lineitem` plays the `gwas` fact table (l_suppkey ≈ chr,
  * l_partkey ≈ pos), `part`/`supplier` play the `b37`/`marker` dims,
  * `orders` plays `study`. Each query cites the reference behavior it
  * models. All queries are pure DataFrame API — filters and projections
  * stay declarative so Catalyst pushes them into the parquet scan, which
  * is what makes these viable at 100 TB.
  */
object ReferenceQueries {

  /** Region query: `chr == c AND pos BETWEEN start AND end`
    * (reference: gwasDB/app.R:82-87). Pushed-down scan, no shuffle. */
  def regionFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_suppkey") === 5 && col("l_partkey").between(50, 150))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      // (l_orderkey, l_linenumber) is NOT unique in this data — total
      // ordering needs every column so both engines agree on row order
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")

  /** Marker-name pattern search via `str_detect` (app.R:96-101). */
  def markerSearch(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  /** Locus window: look a marker up, then pull everything within a
    * half-window of its position (app.R:148-154, ±10 kb there). The
    * single-row anchor is broadcast, so the fact scan stays a pushed
    * range filter. */
  def locusWindow(s: SparkSession, d: String): DataFrame = {
    val anchor = part(s, d).filter(col("p_partkey") === 42)
      .select(col("p_size").as("center"))
    lineitem(s, d)
      .crossJoin(broadcast(anchor))
      .filter(col("l_quantity").between(col("center") - 5, col("center") + 5))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("center"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** Per-chromosome row counts (wrangle_data.Rmd:132). Partial-agg
    * (map-side combine) groupBy — shuffles one row per (part, key). */
  def chrCounts(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_suppkey")

  /** The `combined` / export view: fact left-joined to both dims with a
    * QC filter (postgres_process.Rmd:137: `impute_score >= 0.3`). Dims
    * are broadcast — at 100 TB the fact table never shuffles for this. */
  /** Served through a PERSISTENT catalog view, the reference's own
    * shape (`CREATE VIEW ukbb_gwas_results_export`,
    * R/postgres_process.Rmd:137): the definition lands in the graft
    * registry once (CREATE OR REPLACE is idempotent across runs and
    * sessions) and the read re-analyzes the stored SQL against the
    * data — broadcast hints, filter pushdown and column pruning plan
    * through the view exactly as the direct DataFrame chain did. */
  def combinedView(s: SparkSession, d: String): DataFrame = {
    val wh = sys.props("java.io.tmpdir") + "/graft_combined_wh"
    s.conf.set("graft.catalog.warehouse", wh)
    // create-once: the definition is durable registry state — re-issuing
    // CREATE OR REPLACE per execution would bill every run a registry
    // commit for a no-op redefinition. The registered payload embeds the
    // dataset dir, so a different sf dir (or a missing view) recreates.
    val registered = graft.storage.Catalog.entriesAt(s, wh).get("combined")
    if (!registered.exists(_.contains(s"$d/lineitem.parquet")))
      s.sql(
        s"""CREATE OR REPLACE VIEW graft.combined AS
           |SELECT /*+ BROADCAST(p, su) */
           |  l_orderkey, l_linenumber, p_name, p_brand, s_name,
           |  l_extendedprice * (1.0D - l_discount) AS revenue
           |FROM parquet.`$d/lineitem.parquet` l
           |LEFT JOIN parquet.`$d/part.parquet` p ON l_partkey = p_partkey
           |LEFT JOIN parquet.`$d/supplier.parquet` su ON l_suppkey = s_suppkey
           |WHERE l_discount >= 0.03""".stripMargin)
    s.sql("SELECT * FROM graft.combined ORDER BY l_orderkey, l_linenumber, " +
      "p_name, p_brand, s_name, revenue")
  }

  /** Study catalog summary (app.R:33 collects the study table; study has
    * n/n_case/n_control totals). Dimension-sized aggregate. */
  def studySummary(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_order"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_order"))
      .orderBy("o_orderstatus")

  /** Orphan detection — rows in one table with no match in another,
    * i.e. the reference's left-join-where-null audit
    * (wrangle_data.Rmd:355) as a proper anti join. */
  def antijoinQc(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(
        orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Membership filter `snp %in% gwas$snp` (wrangle_data.Rmd:241) as a
    * semi join — never materializes the probe side's payload. */
  def semijoinFilter(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(
        lineitem(s, d).filter(col("l_quantity") > 45),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  /** Distinct id↔alias pairs (wrangle_data.Rmd:82 `distinct()`).
    * Partial-aggregate distinct: combines map-side before shuffling. */
  def distinctPairs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_partkey", "l_suppkey")
      .distinct()
      .orderBy("l_partkey", "l_suppkey")

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Long→wide pivot, the HWE `pivot_wider` (wrangle_data.Rmd:207-213):
    * one row per key, one column per category. Pivot values are declared
    * explicitly so the plan needs no discovery pass over the data. */
  def pivotWide(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(dsum(col("value")))
      .orderBy("user_id")

  /** MAF from a genotype-count string `"hom1/het/hom2"`:
    * `(het + 2*hom1) / (2*total)` (wrangle_data.Rmd:197-201). The parse
    * is split/cast arithmetic — codegen'd, no UDF. */
  def mafCalc(s: SparkSession, d: String): DataFrame = {
    val withGeno = lineitem(s, d).withColumn(
      "geno",
      concat_ws("/", pmod(col("l_partkey"), lit(50)), col("l_suppkey"), col("l_linenumber")))
    val g = split(col("geno"), "/")
    val hom1 = g.getItem(0).cast("double")
    val het = g.getItem(1).cast("double")
    val hom2 = g.getItem(2).cast("double")
    withGeno
      .select(
        col("l_orderkey"), col("l_linenumber"), col("geno"),
        ((het + lit(2.0) * hom1) / (lit(2.0) * (hom1 + het + hom2))).as("maf"))
      .orderBy("l_orderkey", "l_linenumber", "geno", "maf")
  }

  /** `neg_log10_p = -log10(p)` derivation (wrangle_data.Rmd:265). */
  def negLog10(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        round(-log10(col("value") + lit(1.0)), 6).as("neg_log10_v"))
      .orderBy("event_id")

  /** Strongest associations — global top-k. Spark plans this as
    * TakeOrderedAndProject: each partition keeps k rows, no full sort. */
  def topHits(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** kgp_id synthesis `chr:pos_ref_alt` + regex re-extraction of the
    * alleles (wrangle_data.Rmd:65,217). */
  def idNormalize(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn(
        "kgp_id",
        concat(
          col("l_suppkey"), lit(":"), col("l_partkey"), lit("_"),
          col("l_returnflag"), lit("_"), col("l_linestatus")))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("kgp_id"),
        regexp_extract(col("kgp_id"), "_([A-Z]+)_", 1).as("ref_allele"),
        regexp_extract(col("kgp_id"), "_([A-Z]+)$", 1).as("alt_allele"))
      .orderBy("l_orderkey", "l_linenumber", "kgp_id")

  /** Marker alias resolution (load_urate2020_gwas.Rmd:159-161) on the
    * test tables: `part` plays the marker alias table (positional
    * kgp_id + rs name), `lineitem` plays the load fact. Rows cover all
    * four reference branches: rs name resolved via the (marker_name,
    * ref, alt) join, rs name unmatched (allele mismatch → NULL, the
    * reference's NA), positional id kept as-is, and `,NNN` composite
    * suffix stripped. The join runs through GwasOps.resolveMarkerIds —
    * one alias-table-sized join, AQE-broadcast at this SF. */
  def aliasResolve(s: SparkSession, d: String): DataFrame = {
    val letters = array(lit("A"), lit("C"), lit("G"), lit("T"))
    def refOf(k: Column) = element_at(letters, (pmod(k, lit(4)) + 1).cast("int"))
    def altOf(k: Column) = element_at(letters, (pmod(k + 1, lit(4)) + 1).cast("int"))
    def kgpOf(k: Column) =
      concat(pmod(k, lit(22)) + 1, lit(":"), k, lit("_"), refOf(k), lit("_"), altOf(k))
    val marker = part(s, d).select(
      kgpOf(col("p_partkey")).as("kgp_id"),
      concat(lit("rs"), col("p_partkey")).as("marker_name"))
    val load = lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      concat(lit("rs"), col("l_partkey")).as("snp_id"),
      when(pmod(col("l_linenumber"), lit(2)) === 0, concat(lit("rs"), col("l_partkey")))
        .when(pmod(col("l_linenumber"), lit(3)) === 0,
          concat(kgpOf(col("l_partkey")), lit(",123")))
        .otherwise(kgpOf(col("l_partkey"))).as("chr_pos_alleles"),
      when(pmod(col("l_linenumber"), lit(4)) === 2, altOf(col("l_partkey")))
        .otherwise(refOf(col("l_partkey"))).as("ref"),
      altOf(col("l_partkey")).as("alt"))
    GwasOps.resolveMarkerIds(load, marker)
      .select("l_orderkey", "l_linenumber", "snp_id", "kgp_id")
      .orderBy("l_orderkey", "l_linenumber", "snp_id", "kgp_id")
  }

  /** The plot-facet query: combined view restricted to a region AND a
    * set of study names — `filter(name %in% input$gwas_study)`
    * (app.R:169-176). The IN list is tiny and constant → Catalyst
    * turns it into pushed-down OR predicates on the dim. */
  def facetFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(orders(s, d)), col("l_orderkey") === col("o_orderkey"))
      .filter(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("l_partkey").between(1, 100))
      .select("l_orderkey", "l_linenumber", "l_partkey", "o_orderpriority", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")

  /** QC removal set: rows failing thresholds (info_score < 0.3 / maf
    * below floor — wrangle_data.Rmd:234,255). */
  def qcFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") < 5 || col("l_tax") > 0.07)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_tax")

  /** Manhattan-plot source: per (chr, position-bucket) peak signal
    * (app.R:163-182 plots neg_log10_p over pos). Bucketized aggregate —
    * the downsampling you'd do before plotting 100 TB. */
  def manhattanBin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(
        col("l_suppkey"),
        floor(col("l_partkey") / lit(20)).as("bucket"))
      .agg(max(col("l_extendedprice")).as("peak"), count(lit(1)).as("n"))
      .orderBy("l_suppkey", "bucket")

  /** FK orphan count — the load-time referential check
    * (wrangle_data.Rmd:353-356). */
  def referentialCheck(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** Per-group best hit via window rank — "leading SNP per study".
    * Partitioned window, no global sort. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_suppkey")
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_region_filter" -> regionFilter _,
    "q_marker_search" -> markerSearch _,
    "q_locus_window" -> locusWindow _,
    "q_chr_counts" -> chrCounts _,
    "q_combined_view" -> combinedView _,
    "q_study_summary" -> studySummary _,
    "q_antijoin_qc" -> antijoinQc _,
    "q_semijoin_filter" -> semijoinFilter _,
    "q_distinct_pairs" -> distinctPairs _,
    "q_pivot_wide" -> pivotWide _,
    "q_maf_calc" -> mafCalc _,
    "q_neg_log10" -> negLog10 _,
    "q_top_hits" -> topHits _,
    "q_id_normalize" -> idNormalize _,
    "q_alias_resolve" -> aliasResolve _,
    "q_qc_filter" -> qcFilter _,
    "q_facet_filter" -> facetFilter _,
    "q_manhattan_bin" -> manhattanBin _,
    "q_referential_check" -> referentialCheck _,
    "q_window_rank" -> windowRank _,
  )

  val oracles: Map[String, String] = Map(
    "q_region_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem WHERE l_suppkey = 5 AND l_partkey BETWEEN 50 AND 150
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,
    "q_marker_search" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE '%widget%' ORDER BY p_partkey""".stripMargin,
    "q_locus_window" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  (SELECT p_size FROM part WHERE p_partkey = 42) AS center
        |FROM lineitem
        |WHERE l_quantity BETWEEN (SELECT p_size FROM part WHERE p_partkey = 42) - 5
        |                     AND (SELECT p_size FROM part WHERE p_partkey = 42) + 5
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_chr_counts" ->
      "SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey",
    "q_combined_view" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand, s_name,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |LEFT JOIN part ON l_partkey = p_partkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_discount >= 0.03
        |ORDER BY l_orderkey, l_linenumber, p_name, p_brand, s_name, revenue""".stripMargin,
    "q_study_summary" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_price,
         |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
         |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_order
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_antijoin_qc" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_semijoin_filter" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,
    "q_distinct_pairs" ->
      """SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q_maf_calc" ->
      """WITH g AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_partkey % 50 AS VARCHAR) || '/' || CAST(l_suppkey AS VARCHAR)
        |      || '/' || CAST(l_linenumber AS VARCHAR) AS geno
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, geno,
        |  (CAST(split_part(geno, '/', 2) AS DOUBLE)
        |     + 2.0 * CAST(split_part(geno, '/', 1) AS DOUBLE))
        |  / (2.0 * (CAST(split_part(geno, '/', 1) AS DOUBLE)
        |     + CAST(split_part(geno, '/', 2) AS DOUBLE)
        |     + CAST(split_part(geno, '/', 3) AS DOUBLE))) AS maf
        |FROM g ORDER BY l_orderkey, l_linenumber, geno, maf""".stripMargin,
    "q_neg_log10" ->
      """SELECT event_id, round(-log10(value + 1.0), 6) AS neg_log10_v
        |FROM events ORDER BY event_id""".stripMargin,
    "q_top_hits" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_id_normalize" ->
      """WITH k AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_suppkey AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR)
        |      || '_' || l_returnflag || '_' || l_linestatus AS kgp_id
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, kgp_id,
        |  regexp_extract(kgp_id, '_([A-Z]+)_', 1) AS ref_allele,
        |  regexp_extract(kgp_id, '_([A-Z]+)$', 1) AS alt_allele
        |FROM k ORDER BY l_orderkey, l_linenumber, kgp_id""".stripMargin,
    "q_alias_resolve" ->
      """WITH marker AS (
        |  SELECT concat((p_partkey % 22) + 1, ':', p_partkey, '_',
        |           substr('ACGT', CAST(p_partkey % 4 AS INT) + 1, 1), '_',
        |           substr('ACGT', CAST((p_partkey + 1) % 4 AS INT) + 1, 1)) AS kgp_id,
        |         concat('rs', p_partkey) AS marker_name
        |  FROM part),
        |m AS (
        |  SELECT kgp_id AS kgp_id_m, marker_name,
        |         regexp_extract(kgp_id, '_([ACGT]+)_', 1) AS ref_m,
        |         regexp_extract(kgp_id, '_([ACGT]+)$', 1) AS alt_m
        |  FROM marker),
        |li AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         substr('ACGT', CAST(l_partkey % 4 AS INT) + 1, 1) AS ref0,
        |         substr('ACGT', CAST((l_partkey + 1) % 4 AS INT) + 1, 1) AS alt0,
        |         concat((l_partkey % 22) + 1, ':', l_partkey, '_',
        |           substr('ACGT', CAST(l_partkey % 4 AS INT) + 1, 1), '_',
        |           substr('ACGT', CAST((l_partkey + 1) % 4 AS INT) + 1, 1)) AS kgp
        |  FROM lineitem),
        |ld AS (
        |  SELECT l_orderkey, l_linenumber,
        |         concat('rs', l_partkey) AS snp_id,
        |         CASE WHEN l_linenumber % 2 = 0 THEN concat('rs', l_partkey)
        |              WHEN l_linenumber % 3 = 0 THEN concat(kgp, ',123')
        |              ELSE kgp END AS chr_pos_alleles,
        |         CASE WHEN l_linenumber % 4 = 2 THEN alt0 ELSE ref0 END AS ref,
        |         alt0 AS alt
        |  FROM li)
        |SELECT l_orderkey, l_linenumber, snp_id,
        |  regexp_replace(
        |    CASE WHEN regexp_matches(chr_pos_alleles, '(rs)|(Aff)')
        |         THEN kgp_id_m ELSE chr_pos_alleles END,
        |    ',[0-9]+', '', 'g') AS kgp_id
        |FROM ld LEFT JOIN m
        |  ON snp_id = marker_name AND ref = ref_m AND alt = alt_m
        |ORDER BY l_orderkey, l_linenumber, snp_id, kgp_id""".stripMargin,
    "q_facet_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, o_orderpriority, l_quantity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND l_partkey BETWEEN 1 AND 100
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,
    "q_qc_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_tax FROM lineitem
        |WHERE l_quantity < 5 OR l_tax > 0.07
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_tax""".stripMargin,
    "q_manhattan_bin" ->
      """SELECT l_suppkey, CAST(FLOOR(l_partkey / 20) AS BIGINT) AS bucket,
        |  max(l_extendedprice) AS peak, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_suppkey, bucket""".stripMargin,
    "q_referential_check" ->
      """SELECT count(*) AS n_orphans FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)""".stripMargin,
    "q_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,
  ) + ("q_pivot_wide" -> {
    val cols = eventTypes.map { t =>
      s"""CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = '$t') AS DOUBLE) AS "$t""""
    }.mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  })
}
