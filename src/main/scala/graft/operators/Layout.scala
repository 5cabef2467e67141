package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning at 100 TB.
  *
  * A parquet lake is pruned by per-file (and per-row-group) min/max
  * statistics: a file is skipped when a pushed predicate cannot match its
  * column ranges. Sorting by ONE column makes that column's ranges tight
  * and every other column's ranges full-width — a predicate on any second
  * dimension scans everything. Interleaving the bits of several dimensions
  * into one Morton z-value and range-partitioning + sorting by it keeps
  * EVERY constituent dimension's per-file range bounded (each contiguous
  * z-run is a bounded box in dimension space), so multi-dimensional box
  * predicates skip most files no matter which dimension they constrain —
  * the layout discipline behind Delta/Iceberg Z-ORDER clustering.
  *
  * Everything here is arithmetic on columns (shift/mask/add — whole-stage
  * codegen, no UDF) plus one `repartitionByRange` exchange at write time;
  * nothing touches the driver.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each dimension
    * column (dimension 0 occupies the least-significant interleaved
    * position). Inputs must be non-negative; bits above `bits` are
    * ignored (bit-extract masks inherently). `dims.size * bits` must fit
    * a signed long. Pure codegen arithmetic — usable in selects,
    * predicates, and write-path partitioning alike. */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"z-value needs 1..n dims with dims*bits <= 63, got ${dims.size} x $bits")
    val terms = for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(d.cast("long"), i).bitwiseAND(lit(1L)),
      i * dims.size + j)
    terms.reduce(_ + _)
  }

  /** The DuckDB-mirrorable SQL form of [[zValue]] over already-projected
    * BIGINT columns — `(d // 2^i) % 2` extracts bit i exactly as the
    * shift/mask does, so both engines compute identical z-values. Used by
    * the oracle; exposed so callers can embed the same arithmetic in
    * external engines. */
  def zValueSql(dims: Seq[String], bits: Int = 16): String =
    (for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield s"(($d // ${1L << i}) % 2) * ${1L << (i * dims.size + j)}")
      .mkString(" + ")

  /** Write `df` z-order-clustered on `dims`: range-partition into
    * `nFiles` splits of the z-value and sort inside each, so every output
    * file covers one contiguous z-run — a bounded box in dimension space
    * whose parquet min/max stats prune multi-dimensional box predicates.
    * One exchange total; the transient `_z` column is dropped before the
    * bytes hit disk. */
  def zorderWrite(df: DataFrame, dims: Seq[String], path: String,
                  nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zValue(dims.map(col), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
