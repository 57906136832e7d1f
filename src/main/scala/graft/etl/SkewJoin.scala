package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §"shuffle/partitioning" scale
  * posture; AQE's skew-join split handles moderate skew automatically —
  * salting is the explicit tool for pathological keys, e.g. one user_id
  * holding 10% of a 100 TB fact table).
  *
  * Mechanics: the large side gets a deterministic salt in [0, n) derived
  * from a row-unique column (NOT rand() — re-runs must produce identical
  * plans/results for the oracle), widening the hot key across n reducers;
  * the small side is replicated n times with every salt value. Join on
  * (key, salt) then drop the salt. Result set identical to the unsalted
  * join; the shuffle is n-way wider on the hot key.
  */
object SkewJoin {

  /** @param saltSource a row-unique column on `large` (a PK) so salt values
    *                    spread uniformly and deterministically.
    */
  def saltedJoin(
      large: DataFrame,
      largeKey: String,
      small: DataFrame,
      smallKey: String,
      saltSource: Column,
      nSalts: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt", explode(array((0 until nSalts).map(lit): _*)))
    salted
      .join(replicated, salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
