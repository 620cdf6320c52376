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

  /** Sketch of one data slice: (row_, col_, n) — the mergeable state.
    * NULL values are excluded — a null is not a countable item, and its
    * null cell hash would emit a (row_, NULL) register row that a
    * driver-side `getAs[Long]` unboxes to 0, CLOBBERING the real
    * (row, 0) cell and breaking the one-sided est ≥ truth guarantee
    * (a heavy hitter addressing column 0 could then be silently
    * missed before the exact verify). */
  def registers(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(explode(array((0 until Depth).map(i =>
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
    val lookups = values.filter(col(valueCol).isNotNull).select(col(valueCol),
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row_"), cell(i, col(valueCol)).as("col_"))): _*)).as("rc"))
      .select(col(valueCol), col("rc.row_").as("row_"), col("rc.col_").as("col_"))
    lookups.join(regs, Seq("row_", "col_"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .groupBy(valueCol).agg(min("n").as("est"))
  }

  /** HEAVY HITTERS with a sketch prefilter and exact verification — the
    * end-to-end use the sketch exists for: find every value whose count
    * is ≥ `thresholdPpm` of the stream WITHOUT an unfiltered global
    * count of the whole vocabulary.
    *
    * Pass 1 builds the registers (shuffle bounded by the sketch); the
    * Depth×Width table and the total row count (Σn / Depth — every row
    * feeds Depth cells) collect driver-side, both bounded by the SKETCH
    * SIZE, never the data. Pass 2 filters each row by its estimate — a
    * NARROW expression (Depth literal-array lookups + least), no join —
    * and only surviving rows enter the exact groupBy count. Because the
    * estimate is one-sided (est ≥ true count, nothing deflates), the
    * candidate set provably contains every true heavy hitter; the exact
    * count then drops collision-inflated false candidates, so the
    * result EQUALS the exact answer while the count shuffle carries
    * only heavy-hitter mass + collision noise instead of the full
    * vocabulary. Both filters state `x·1e6 ≥ total·ppm` in exact
    * integers (prefilter uses the floor threshold — weaker, still a
    * superset). `est`/`overcount` ride along so the sketch's one-sided
    * error stays visible. */
  def heavyHitters(df: DataFrame, valueCol: String,
                   thresholdPpm: Long): DataFrame = {
    val regRows = registers(df, valueCol).collect()
    val table = Array.fill(Depth)(new Array[Long](Width))
    regRows.foreach { r =>
      table(r.getAs[Int]("row_"))(r.getAs[Long]("col_").toInt) = r.getAs[Long]("n")
    }
    val total = regRows.map(_.getAs[Long]("n")).sum / Depth
    val floorThr = total * thresholdPpm / 1000000L
    val est = least((0 until Depth).map { i =>
      element_at(typedlit(table(i).toSeq),
        (cell(i, col(valueCol)) + 1).cast("int"))
    }: _*)
    df.withColumn("est", est)
      .filter(col("est") >= floorThr)
      .groupBy(valueCol)
      .agg(count(lit(1)).as("cnt"), min("est").as("est"))
      .filter(col("cnt") * lit(1000000L) >= lit(total * thresholdPpm))
      .select(col(valueCol), col("cnt"), col("est"),
        (col("est") - col("cnt")).as("overcount"))
  }

  /** The whole sketch + point-estimate pipeline as SQL text for oracle
    * queries: estimates of `valuesSql` (a one-column relation `t(v)`)
    * over `valueExpr` drawn from `from`. Mirrors [[cell]] bit-for-bit:
    * the poly_hash fold runs over 'i:' || value, then the
    * [[HyperLogLog]] scramble chain, then mod Width. */
  def sketchSql(valueExpr: String, from: String, valuesSql: String,
                alias: String): String = {
    // The fold's lambda variable MUST NOT be named `i`: $e embeds the
    // sketch ROW INDEX column `i` (the 'i:' prefix that decorrelates the
    // Depth rows), and a lambda parameter `i` would SHADOW it — every
    // row would hash the same position-prefixed string, collapsing the
    // min-over-rows guarantee to one hash function (q117 caught this:
    // estimates inflated 2-3x on a 916-value vocabulary; q110's 31-token
    // vocab had no collisions, so the collapse was invisible there).
    def polyFold(e: String) =
      s"""list_reduce(list_prepend(CAST(${PolyHash.DefaultSeed} AS BIGINT),
         |  list_transform(range(1, length($e) + 1),
         |    cpos -> CAST(ascii(substr($e, CAST(cpos AS INTEGER), 1)) AS BIGINT))),
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
