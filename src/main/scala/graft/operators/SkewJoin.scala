package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting can't apply (e.g. the skewed side feeds a
  * co-partitioned downstream op, or key skew is known a priori).
  *
  * Mechanics: each row of the skewed (big) side gets a deterministic
  * salt in [0, salts); the small side is exploded into `salts` replicas.
  * The join key becomes (key, salt), spreading one hot key over `salts`
  * reducers. Result is row-identical to the unsalted inner join; cost is
  * `salts`× replication of the small side — keep it for genuinely small
  * build sides (if the small side broadcasts, you don't need salting at
  * all; this is for when BOTH sides are too big to broadcast and one is
  * skewed).
  *
  * The salt is a hash of the whole big-side row, so the operator stays
  * deterministic under any partitioning (no rand(), no partition ids).
  */
object SkewJoin {

  def salted(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
