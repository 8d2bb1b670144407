package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers (see docs/DETERMINISM.md).
  *
  * Testdata money columns are 2-decimal values stored as doubles. Summing
  * them (or their products) as doubles is nondeterministic across partial-
  * aggregation orders and diverges from DuckDB at round() ties. Casting to
  * DECIMAL first makes the aggregation exact integer arithmetic in both
  * engines; the final cast back to double is then bit-identical.
  */
object Num {
  private val D = DecimalType(18, 2)

  /** Exact sum of a 2-decimal double column, emitted as double.
    * SQL shape: CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact revenue sum: sum(price * (1 - disc)) in decimal(…,4), as double.
    * SQL shape:
    * CAST(sum(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) AS DOUBLE)
    */
  def revSum(price: Column, disc: Column): Column =
    sum(price.cast(D) * (lit(1) - disc.cast(D))).cast("double")

  /** Exact row-level net price (4-decimal), as double. */
  def netPrice(price: Column, disc: Column): Column =
    (price.cast(D) * (lit(1) - disc.cast(D))).cast("double")
}
