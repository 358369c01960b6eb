package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}
import graft.tables.Tables

/** The two-pass operators (bounded driver prefix + returned plan)
  * evaluate their source twice by design. These pin the documented
  * precondition's payoff: over a deterministic source, both
  * evaluations agree — and the RESULT is a pure function of the rows,
  * not of the physical layout the source happened to arrive in.
  */
class ReEvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: identical (id, offset) across re-runs and physical layouts") {
    val docs = Tables.documents(spark, sf)
    def run(d: DataFrame): Set[(Long, Long)] =
      Packing.packSequences(d, size(split(col("text"), " ")), budget = 512)
        .select("doc_id", "offset").as[(Long, Long)].collect().toSet
    val base = run(docs)
    assert(run(docs) == base, "re-running over the same source diverged")
    // the prefix sum telescopes across ANY range boundaries, so a
    // different incoming partitioning must not move a single offset
    assert(run(docs.repartition(7)) == base, "7-partition layout diverged")
    assert(run(docs.repartition(3)) == base, "3-partition layout diverged")
  }

  test("deterministicShuffle: identical (id, shuffle_pos) across re-runs and layouts") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    def run(d: DataFrame): Set[(Long, Long)] =
      Sampling.deterministicShuffle(d, salt = "re1")
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toSet
    val base = run(docs)
    assert(run(docs) == base, "re-running over the same source diverged")
    assert(run(docs.repartition(5)) == base, "repartitioned layout diverged")
  }
}
