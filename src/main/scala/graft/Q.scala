package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a DataFrame builder over a TESTDATA scale dir,
  * plus (when SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.
  *
  * Numeric-comparison convention for oracle queries: aggregate DOUBLE columns
  * through DECIMAL (exact in both engines — the source data carries <=2
  * decimal digits, so double->decimal(…,4) casts can never land on a rounding
  * tie) and cast the final aggregate back to DOUBLE. Summation order then
  * cannot perturb low-order bits, so Spark and DuckDB hash-match bit-exactly.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact decimal sum of a double column, returned as double (Spark side). */
  val DecSumDoc =
    "CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) -- mirror on the DuckDB side"
}
