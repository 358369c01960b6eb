package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * skew at runtime; explicit salting is the static fallback when one
  * key dominates so hard that even split partitions overwhelm a task —
  * the left side spreads each key over `salts` sub-keys, the right
  * side replicates each row `salts` times, and the join key becomes
  * (key, salt). Replication cost is |right| × salts, so use it with a
  * small-ish right side and a genuinely pathological left.
  */
object Joins {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLeft
      .join(saltedRight, saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
