package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A plain shuffled join sends every row of a hot key to ONE reducer; at
  * 100 TB a single celebrity key stalls the stage. Salting splits each
  * hot key into `salts` sub-keys: the probe (large, skewed) side gets a
  * deterministic salt from a row-unique column, the build side is
  * replicated `salts` times, and the join key becomes (key, salt) — the
  * hot key's rows now spread over `salts` reducers. Result set is
  * exactly the plain join's (each probe row meets each matching build
  * row exactly once, under exactly one salt).
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) does this
  * adaptively for sort-merge joins; the explicit operator is for when
  * the skew is known ahead of time or the join is not SMJ.
  */
object SkewJoin {

  /** Inner-join `probe` (skewed side) with `build` on `key`;
    * `saltSource` must name a probe column (any type — it is hashed) so
    * the salt is deterministic, spreading each key's rows uniformly. */
  def saltedInnerJoin(probe: DataFrame, build: DataFrame, key: String,
                      saltSource: String, salts: Int = 8): DataFrame = {
    val p = probe.withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(salts)))
    val b = build.withColumn("_salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
