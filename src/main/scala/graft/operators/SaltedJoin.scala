package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. Engine extension: at 100 TB a shuffle
  * join on a key with hot values (the reference's `'Undefined'` category
  * default is a classic one — every unmatched product lands on one key)
  * sends every row of the hot key to ONE task; that task runs for hours
  * while the rest of the cluster idles.
  *
  * When the dimension side is broadcast-sized the problem vanishes (no
  * shuffle at all) — that is always the first choice. Salting is for the
  * remaining case: both sides too big to broadcast, keys skewed. The fact
  * side appends a deterministic salt in [0, numSalts); the dimension side
  * explodes each row to ALL salts; joining on (key, salt) splits each hot
  * key across numSalts tasks. Row multiplication is dimension-side only
  * (x numSalts), the big fact side is never amplified. The result set is
  * exactly the plain join's (every fact row still meets every matching dim
  * row, at exactly one salt).
  *
  * AQE's skew-join split handles MODERATE skew automatically (it can split
  * a sort-merge partition post-shuffle); explicit salting still wins when a
  * single key exceeds what one sorted spill can handle, and it composes
  * with bucketed/pre-partitioned layouts where AQE's splitting is disabled.
  */
object SaltedJoin {

  /** @param facts      big, possibly skewed side
    * @param dim        smaller (but not broadcast-sized) side, amplified
    *                   x numSalts
    * @param key        equi-join key present on both sides
    * @param numSalts   salt fan-out; ~number of tasks a hot key should span
    * @param saltSource deterministic per-fact-row expression the salt is
    *                   hashed from (a unique id column keeps the spread
    *                   uniform and the result reproducible)
    * @param joinType   "inner" or "left" (dim rows never multiply matches:
    *                   each fact row carries one salt)
    */
  def join(facts: DataFrame, dim: DataFrame, key: String, numSalts: Int,
           saltSource: Column, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    // right/full/semi would be wrong, not slow: the dim side is amplified
    // x numSalts, so unmatched dim rows would surface numSalts times
    require(joinType == "inner" || joinType == "left",
      s"SaltedJoin supports inner/left only, got: $joinType")
    val fs = facts.withColumn("__salt", pmod(hash(saltSource), lit(numSalts)))
    val ds = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    fs.join(ds, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
