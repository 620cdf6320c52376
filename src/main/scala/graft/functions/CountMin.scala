package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) with the
  * same cross-engine-exact arithmetic as [[HyperLogLog]] — the
  * frequency-estimation sketch next to HLL (cardinality) and Bloom
  * (membership): heavy-hitter tracking, per-term counts, and frequency
  * caps over streams too large to count exactly.
  *
  *   - cell hash  = scramble(poly_hash("i:" || value)) mod Width for
  *     each of the Depth rows — the row index is INSIDE the hashed
  *     string, and the scramble's xor-shift rounds are nonlinear, so
  *     the rows are decorrelated (a bare polynomial hash would make
  *     every row a constant offset of every other, collapsing the
  *     min-over-rows guarantee);
  *   - registers  = count per (row, col): at most Depth·Width rows
  *     TOTAL regardless of input size, built map-side-combined — the
  *     100 TB shuffle is bounded by the sketch, not the data;
  *   - merge      = sum per (row, col) ([[mergeRegisters]]): exact and
  *     order-free, so merge(state(A), state(B)) == state(A ⊎ B) for any
  *     batch split — the incremental-maintenance property q110 proves
  *     against a one-shot oracle rebuild;
  *   - estimate   = min over rows of the addressed registers: always
  *     ≥ the true count (only hash collisions inflate, nothing
  *     deflates), within εN with probability 1−δ for ε = e/Width,
  *     δ = e^−Depth.
  *
  * All integer arithmetic — every register and estimate is a BIGINT any
  * engine reproduces bit-for-bit ([[sketchSql]] is the DuckDB replay).
  */
object CountMin {

  val Depth = 4
  val Width = 2048

  /** Register column for row `i`: non-negative (scramble output is a
    * xor of non-negatives < 2^32), so plain % is safe. */
  private def cell(i: Int, value: Column): Column =
    HyperLogLog.scramble(PolyHash.poly_hash(
      concat(lit(s"$i:"), value.cast("string")))) % lit(Width.toLong)

  /** Sketch of one data slice: (row_, col_, n) — the mergeable state. */
  def registers(df: DataFrame, valueCol: String): DataFrame =
    df.select(explode(array((0 until Depth).map(i =>
        struct(lit(i).as("row_"), cell(i, col(valueCol)).as("col_"))): _*)).as("rc"))
      .select(col("rc.row_").as("row_"), col("rc.col_").as("col_"))
      .groupBy("row_", "col_").agg(count(lit(1)).as("n"))

  /** Merge sketches of disjoint slices: counts add per cell. (Unlike
    * the HLL/Bloom merges this one is NOT idempotent — replayed rows
    * inflate counts, so feed it exactly-once slices or guard upstream.) */
  def mergeRegisters(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("row_", "col_").agg(sum("n").as("n"))

  /** Point estimates for `values`: min over rows of the addressed
    * registers. Both sides are sketch-sized (≤ Depth·Width) or
    * query-sized — broadcast territory at any corpus scale. */
  def estimate(regs: DataFrame, values: DataFrame, valueCol: String): DataFrame = {
    val lookups = values.select(col(valueCol),
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row_"), cell(i, col(valueCol)).as("col_"))): _*)).as("rc"))
      .select(col(valueCol), col("rc.row_").as("row_"), col("rc.col_").as("col_"))
    lookups.join(regs, Seq("row_", "col_"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .groupBy(valueCol).agg(min("n").as("est"))
  }

  /** The whole sketch + point-estimate pipeline as SQL text for oracle
    * queries: estimates of `valuesSql` (a one-column relation `t(v)`)
    * over `valueExpr` drawn from `from`. Mirrors [[cell]] bit-for-bit:
    * the poly_hash fold runs over 'i:' || value, then the
    * [[HyperLogLog]] scramble chain, then mod Width. */
  def sketchSql(valueExpr: String, from: String, valuesSql: String,
                alias: String): String = {
    def polyFold(e: String) =
      s"""list_reduce(list_prepend(CAST(${PolyHash.DefaultSeed} AS BIGINT),
         |  list_transform(range(1, length($e) + 1),
         |    i -> CAST(ascii(substr($e, CAST(i AS INTEGER), 1)) AS BIGINT))),
         |  (a, c) -> (a * ${PolyHash.DefaultMult} + c) % ${PolyHash.Mod32})""".stripMargin
    import HyperLogLog.{Mask31, Mult1, Mult2}
    val mod = PolyHash.Mod32
    // the scramble chain as CTE stages (identical to HyperLogLog.sketchSql)
    def scrambled(src: String, keys: String) =
      s""" h0 AS (SELECT $keys, xor(h, h >> 16) AS h FROM $src),
         | s1 AS (SELECT $keys, ((h & $Mask31) * $Mult1) % $mod AS h FROM h0),
         | s2 AS (SELECT $keys, xor(h, h >> 15) AS h FROM s1),
         | s3 AS (SELECT $keys, ((h & $Mask31) * $Mult2) % $mod AS h FROM s2),
         | hx AS (SELECT $keys, xor(h, h >> 13) AS h FROM s3)""".stripMargin
    s"""(WITH src AS (SELECT CAST($valueExpr AS VARCHAR) AS v FROM $from),
       | rv AS (SELECT i, v FROM src CROSS JOIN range(0, $Depth) t(i)),
       | hp AS (SELECT i, ${polyFold(s"(CAST(i AS VARCHAR) || ':' || v)")} AS h FROM rv),
       |${scrambled("hp", "i")},
       | regs AS (SELECT i, h % $Width AS c, count(*) AS n FROM hx GROUP BY 1, 2),
       | qsrc AS (SELECT CAST(v AS VARCHAR) AS v FROM $valuesSql),
       | qrv AS (SELECT i, v FROM qsrc CROSS JOIN range(0, $Depth) t(i)),
       | qhp AS (SELECT i, v, ${polyFold(s"(CAST(i AS VARCHAR) || ':' || v)")} AS h FROM qrv),
       | qh0 AS (SELECT i, v, xor(h, h >> 16) AS h FROM qhp),
       | qs1 AS (SELECT i, v, ((h & $Mask31) * $Mult1) % $mod AS h FROM qh0),
       | qs2 AS (SELECT i, v, xor(h, h >> 15) AS h FROM qs1),
       | qs3 AS (SELECT i, v, ((h & $Mask31) * $Mult2) % $mod AS h FROM qs2),
       | qhx AS (SELECT i, v, xor(h, h >> 13) AS h FROM qs3),
       | ql AS (SELECT v, i, h % $Width AS c FROM qhx)
       |SELECT ql.v AS v, CAST(min(coalesce(regs.n, 0)) AS BIGINT) AS $alias
       |FROM ql LEFT JOIN regs ON regs.i = ql.i AND regs.c = ql.c
       |GROUP BY ql.v)""".stripMargin
  }
}
