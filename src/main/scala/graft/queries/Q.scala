package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: a Spark implementation and (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Determinism rules shared by every query:
  *   - numeric outputs are BIGINT scaled integers (micros / cents / ppm)
  *     or raw doubles produced by identical IEEE ops on both engines —
  *     never floating-point aggregates (summation order would break the
  *     hash compare);
  *   - every output has a total ORDER BY ending in a unique key;
  *   - derived integer columns are cast to BIGINT on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
