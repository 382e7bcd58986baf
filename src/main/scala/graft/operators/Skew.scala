package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key dominates (hot key), a plain shuffle join lands the
  * whole hot partition on one executor. Salting splits each key into
  * `salts` sub-keys: the big side gets a deterministic per-row salt, the
  * small side is replicated once per salt value — the hot key's rows now
  * spread over `salts` reducers. Result is EXACTLY the plain join
  * (asserted in SkewSpec); cost is small-side replication ×salts.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers sort-merge
  * cases automatically; explicit salting remains the tool for aggregations
  * over pre-shuffled layouts and for engines/paths AQE doesn't touch.
  */
object Skew {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salts` ways.
    * The salt is derived from the big side's whole row hash — deterministic,
    * uniformly spread, and independent of the join key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltCol = pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts))
    val saltedBig = big.withColumn("__salt", saltCol)
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
