package graft.gwas

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest of the reference's raw file formats.
  *
  * The reference shells out to awk + vroom to shape per-chromosome
  * marker/GWAS TSVs before a Postgres COPY (wrangle_data.Rmd:63-93).
  * Here the same shaping is a declarative scan: Spark's CSV source
  * reads the TSVs in parallel with an explicit schema (no inference
  * pass), and the filters/projections are Catalyst expressions.
  */
object GwasIngest {

  /** Marker-id file layout produced by the reference's awk step
    * (wrangle_data.Rmd:65): kgp_id, snp, chr, pos, ref, alt — TSV,
    * headerless. */
  val markerFileSchema: StructType = StructType(Seq(
    StructField("kgp_id", StringType),
    StructField("snp", StringType),
    StructField("chr", IntegerType),
    StructField("pos", IntegerType),
    StructField("ref", StringType),
    StructField("alt", StringType)))

  def readMarkerFile(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .schema(markerFileSchema)
      .csv(path)

  /** The `b37` table feed (wrangle_data.Rmd:77). */
  def b37Table(markers: DataFrame): DataFrame =
    markers.select("kgp_id", "chr", "pos", "ref", "alt")

  /** The `marker` alias-table feed: only names that are NOT positional
    * ids — the reference keeps rs/Affx names by dropping anything
    * matching `[0-9]+:[0-9]+_[A-Z]+_[A-Z]` (wrangle_data.Rmd:82). */
  def markerTable(markers: DataFrame): DataFrame =
    markers
      .filter(!col("snp").rlike("[0-9]+:[0-9]+_[A-Z]+_[A-Z]"))
      .select(col("kgp_id"), col("snp").as("marker_name"))
      .distinct()

  /** Impute-info file (ukb mfi): marks SNPs for removal below the info
    * score cutoff (wrangle_data.Rmd:234). */
  val mfiSchema: StructType = StructType(Seq(
    StructField("chr_pos_alleles", StringType),
    StructField("snp_id", StringType),
    StructField("position", IntegerType),
    StructField("ref", StringType),
    StructField("alt", StringType),
    StructField("maf", DoubleType),
    StructField("a1", StringType),
    StructField("info_score", DoubleType)))

  def readMfi(spark: SparkSession, path: String, minInfo: Double = 0.3): DataFrame =
    spark.read.option("sep", "\t").schema(mfiSchema).csv(path)
      .withColumn("remove_snp", col("info_score") < minInfo)
}
