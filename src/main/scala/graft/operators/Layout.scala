package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — the write-side half of multi-dimensional
  * pruning at 100 TB. A table range-partitioned and sorted on a
  * Z-order (Morton) key keeps rows that are close in BOTH dimensions
  * in the same files, so per-file min/max statistics prune scans for
  * predicates on EITHER dimension — where a lexicographic
  * (x, y) sort only prunes on the leading column. This is the layout
  * primitive behind Delta/Iceberg Z-ORDER BY, expressed as plain
  * columns + repartitionByRange, no table format required.
  */
object Layout {

  /** 2-D Morton key: interleave the low `bits` of two non-negative
    * int columns (x gets the even bit positions, y the odd). Pure
    * bit arithmetic over codegen'd built-ins — deterministic, so the
    * DuckDB oracle replays it term for term. Caller buckets raw
    * values into [0, 2^bits) first (e.g. `% (1 << bits)` or a range
    * quantization) — the key covers 2·bits result bits. */
  def zOrderKey2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(x.cast("long"), i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(y.cast("long"), i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _) // terms occupy distinct bits: sum ≡ bitwise OR

  /** Z-clustered parquet: range-partition on the Morton key (so file
    * boundaries are contiguous Z ranges → tight per-file (x, y)
    * bounding boxes) and sort within partitions (so row groups
    * inherit the same property). `nFiles` is a layout decision —
    * size toward the row-group sweet spot, not the core count. */
  def zOrderedParquet(df: DataFrame, path: String, x: Column, y: Column,
                      nFiles: Int, bits: Int = 16): Unit = {
    val keyed = df.withColumn("__z", zOrderKey2(x, y, bits))
    keyed.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
