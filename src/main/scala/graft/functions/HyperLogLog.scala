package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed HyperLogLog with a cross-engine-exact integer estimator.
  *
  * Spark's `approx_count_distinct` is a fine HLL++, but its sketch is an
  * engine-internal binary: no other system can recompute it, so a result
  * built on it can only ever be range-checked. This variant makes the
  * whole sketch portable arithmetic:
  *
  *   - value hash  = poly_hash(value) < 2^32 ([[PolyHash]], replayable
  *     as a `list_reduce` fold in any SQL engine);
  *   - bucket      = top 10 hash bits (m = 1024 registers);
  *   - rho         = leading-zero rank of the low 22 bits, via an exact
  *     comparison chain (no float log2);
  *   - registers   = max(rho) per (group, bucket) — the classic
  *     associative HLL merge, so partial aggregation happens map-side
  *     and the shuffle carries at most m rows per group per partition
  *     regardless of input size (the 100 TB path);
  *   - estimate    = floor(alpha_ppm · m² · 2^23 / Z23) / 1e6 computed
  *     entirely in 64-bit integers, where Z23 = Σ_buckets 2^(23-rho)
  *     (empty buckets contribute 2^23). No transcendental functions →
  *     bit-identical on every engine.
  *
  * This is the raw HLL estimator (Flajolet et al. 2007) without the
  * low-cardinality linear-counting branch — callers are expected in the
  * n/m ≳ 2.5 regime (the correction needs ln(), which is not
  * cross-engine-exact).
  */
object HyperLogLog {

  val M = 1024             // registers (2^10)
  val SuffixBits = 22      // 32-bit hash minus 10 bucket bits
  /** alpha_1024 = 0.7213/(1+1.079/1024) ≈ 0.720540, scaled by 1e6. */
  val AlphaPpm = 720540L

  /** rho(suffix) = position of the first set bit from the top of the
    * 22-bit field, 1-based; 23 if the field is zero. */
  private def rho(suffix: Column): Column =
    (SuffixBits - 1 to 0 by -1).foldLeft(when(lit(false), lit(0))) {
      (acc, b) => if (b == SuffixBits - 1) when(suffix >= (1L << b), SuffixBits - b)
                  else acc.when(suffix >= (1L << b), SuffixBits - b)
    }.otherwise(SuffixBits + 1)

  /** The same rho as SQL text, for oracle queries. */
  def rhoSql(suffix: String): String =
    (SuffixBits - 1 to 0 by -1).map(b =>
      s"WHEN $suffix >= ${1L << b} THEN ${SuffixBits - b}")
      .mkString("CASE ", " ", s" ELSE ${SuffixBits + 1} END")

  /** Estimate distinct `valueCol` per `groupCols`. Output:
    * groupCols..., <alias> BIGINT (floor of the HLL estimate). */
  /** Finalizer: poly_hash is linear, so consecutive inputs ("1","2","3"…)
    * hash to near-consecutive values — the bucket (top bits) would
    * collapse and rho (low bits) would be correlated. Two
    * multiply-mod-prime + xor-shift rounds give avalanche while keeping
    * every intermediate < 2^63 (the & 2^31-1 reductions bound the
    * multiplicands), so overflow-checking engines replay it exactly. */
  val Mult1 = 2654435761L
  val Mult2 = 1597334677L
  val Mask31 = 0x7FFFFFFFL

  private[functions] def scramble(h0: Column): Column = {
    // Fold the top bit down before the & Mask31 reductions: without this,
    // inputs differing only in bit 31 of poly_hash collide (31-bit
    // effective width). xor(h0, h0>>16) moves bit 31 into bit 15, which
    // survives the mask. Mirrored bit-for-bit in sketchSql below.
    val h1 = h0.bitwiseXOR(shiftright(h0, 16))
    val h2 = (h1.bitwiseAND(lit(Mask31)) * lit(Mult1)) % lit(PolyHash.Mod32)
    val h3 = h2.bitwiseXOR(shiftright(h2, 15))
    val h4 = (h3.bitwiseAND(lit(Mask31)) * lit(Mult2)) % lit(PolyHash.Mod32)
    h4.bitwiseXOR(shiftright(h4, 13))
  }

  /** Per-group register table (groupCols..., bucket, r) — the sketch in
    * its mergeable form: registers of two data slices combine by
    * max-per-bucket ([[mergeRegisters]]), which is what makes the sketch
    * an incremental-maintenance state (operators.IncrementalAgg). */
  def registers(df: DataFrame, groupCols: Seq[String],
                valueCol: String): DataFrame = {
    val h = scramble(PolyHash.poly_hash(col(valueCol).cast("string")))
    df.select(groupCols.map(col) :+ shiftright(h, SuffixBits).as("bucket")
        :+ rho(h.bitwiseAND(lit((1L << SuffixBits) - 1))).as("rho_"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "bucket": _*)
      .agg(max("rho_").as("r"))
  }

  /** Merge register tables from disjoint (or overlapping — max is
    * idempotent) data slices: union + max per (group, bucket). */
  def mergeRegisters(groupCols: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(groupCols.head, groupCols.tail :+ "bucket": _*)
      .agg(max("r").as("r"))

  /** Estimate from a register table. All-integer: DIV keeps every step
    * exact (Column./ would go through double and lose bits above 2^53). */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               alias: String): DataFrame = {
    val numerator = AlphaPpm * M * M * (1L << (SuffixBits + 1))
    regs
      .groupBy(groupCols.head, groupCols.tail: _*)
      .agg(
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), ${SuffixBits + 1} - r))").as("z_present"),
        count(lit(1)).as("n_present"))
      .withColumn("z23",
        col("z_present") + (lit(M.toLong) - col("n_present")) * lit(1L << (SuffixBits + 1)))
      .select(groupCols.map(col) :+
        expr(s"(${numerator}L DIV z23) DIV 1000000").as(alias): _*)
  }

  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     alias: String): DataFrame =
    estimate(registers(df, groupCols, valueCol), groupCols, alias)

  /** The same whole-sketch pipeline as SQL text (one sketch), for oracle
    * queries: estimates distinct `valueExpr` per `groupExpr` over `from`. */
  def sketchSql(groupExpr: String, valueExpr: String, from: String,
                alias: String): String = {
    val polyFold =
      s"""list_reduce(list_prepend(CAST(${PolyHash.DefaultSeed} AS BIGINT),
         |  list_transform(range(1, length(CAST($valueExpr AS VARCHAR)) + 1),
         |    i -> CAST(ascii(substr(CAST($valueExpr AS VARCHAR), CAST(i AS INTEGER), 1)) AS BIGINT))),
         |  (a, c) -> (a * ${PolyHash.DefaultMult} + c) % ${PolyHash.Mod32})""".stripMargin
    s"""(WITH hp AS (SELECT $groupExpr AS g, $polyFold AS h FROM $from),
       | h0 AS (SELECT g, xor(h, h >> 16) AS h FROM hp),
       | s1 AS (SELECT g, ((h & $Mask31) * $Mult1) % ${PolyHash.Mod32} AS h FROM h0),
       | s2 AS (SELECT g, xor(h, h >> 15) AS h FROM s1),
       | s3 AS (SELECT g, ((h & $Mask31) * $Mult2) % ${PolyHash.Mod32} AS h FROM s2),
       | hx AS (SELECT g, xor(h, h >> 13) AS h FROM s3),
       | regs AS (SELECT g, h >> $SuffixBits AS bucket,
       |            max(${rhoSql(s"(h & ${(1L << SuffixBits) - 1})")}) AS r
       |          FROM hx GROUP BY g, bucket),
       | zs AS (SELECT g, sum(1 << (${SuffixBits + 1} - r)) AS z_present,
       |          count(*) AS n_present FROM regs GROUP BY g)
       |SELECT g, CAST(${AlphaPpm * M * M * (1L << (SuffixBits + 1))}
       |  // (z_present + ($M - n_present) * ${1L << (SuffixBits + 1)}) // 1000000
       |  AS BIGINT) AS $alias FROM zs)""".stripMargin
  }
}
