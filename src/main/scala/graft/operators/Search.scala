package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-fusion operators: combine independently-produced ranked
  * lists (BM25 keyword search, ANN cosine, any scorer that yields a
  * (doc_id, rank)) into one ranking. The reference is an interactive
  * search app (app.R:96-101 free-text marker search next to positional
  * filters); hybrid retrieval is its ranked generalization — and the
  * standard corpus-curation shape (lexical + embedding evidence) for
  * training-data selection.
  */
object Search {

  /** Reciprocal-rank fusion (Cormack & Clarke's RRF): fused(d) =
    * Σ_lists 1/(k0 + rank_list(d)), here computed as
    * `scale div (k0 + rank)` in INTEGER arithmetic so the fused score
    * is bit-identical on any engine — 1/61 has no finite binary or
    * decimal form, but floor(1000000/61) is one number everywhere.
    *
    * Input: (name, ranking) pairs where each ranking is a bounded
    * top-k list with columns (doc_id, r), r a 1-based rank. Output:
    * one row per doc appearing in ANY list — (doc_id, rrf,
    * <name>_rank …), absent-list ranks null (contributing 0), ranks
    * cast to long. Scale shape: every input is already a top-k
    * (bounded) list, so the full-outer-join chain is k-sized — the
    * corpus never enters the fusion. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k0: Int = 60,
              scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be distinct")
    val renamed = rankings.map { case (name, df) =>
      df.select(col("doc_id"), col("r").cast("long").as(s"${name}_rank"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val rrf = rankings
      .map { case (name, _) =>
        coalesce(expr(s"${scale}L div (${k0}L + ${name}_rank)"), lit(0L))
      }
      .reduce(_ + _)
    joined.select(
      (col("doc_id") +: rrf.as("rrf") +:
        rankings.map { case (name, _) => col(s"${name}_rank") }): _*)
  }
}
