package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. A hot key that would land one
  * monster partition is split across `salts` shuffle partitions:
  *
  *   - the big (skewed) side gets a deterministic salt in [0, salts)
  *     derived from its whole row, spreading one key's rows;
  *   - the small side is replicated `salts` times (explode), so every
  *     (key, salt) bucket can still match.
  *
  * Join output is exactly the plain equi-join's — salting only changes
  * partitioning, so an unsalted SQL join is a valid oracle. AQE's
  * skew-join handles moderate skew automatically; explicit salting is
  * for the pathological keys AQE splits too late or not at all
  * (e.g. a null-like sentinel holding 30% of a 100 TB fact table).
  */
object SkewJoin {

  /** @param big    skewed (large) side
    * @param small  replicated side — its row count multiplies by `salts`
    * @param keys   equi-join column names present on both sides
    * @param salts  number of shards per key
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1)
    val saltCol = "__graft_salt"
    // salt from the whole row hash: deterministic, spreads a single hot
    // key's rows uniformly (row-derived, not key-derived)
    val salted = big.withColumn(saltCol,
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }
}
