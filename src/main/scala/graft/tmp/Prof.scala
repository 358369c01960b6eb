package graft.tmp
import org.apache.spark.sql.functions._
import graft.{GraftSession}
import graft.operators.Dedup
import graft.tables.Tables
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("prof")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    t("warmup")(docs.count())
    val sh = Dedup.withShingles(docs, 2)
    t("shingle arrays")(sh.count())
    t("shingle explode")(sh.select(col("doc_id"), explode(col("sh"))).count())
    val sigs = Dedup.withMinhashSig(sh, 32)
    t("signatures")(sigs.count())
    t("sig+pairs full")(Dedup.minhashCandidates(docs, 2).count())
    println("[prof] candidate pairs = " + Dedup.minhashCandidates(docs, 2).count())
    spark.stop()
  }
}
