package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan efficiency at 100 TB — the write-side
  * half of predicate pushdown. Parquet scans skip row groups by min/max
  * stats; those stats only help when values are clustered. Z-ordering
  * clusters MULTIPLE columns at once (a space-filling curve interleaves
  * the quantized dimensions, so a range predicate on ANY z-column maps
  * to a contiguous-ish run of files); compaction re-sizes a directory
  * of too-small files into stat-friendly, scheduler-friendly chunks.
  */
object Layout {

  /** Z-value (Morton code) of `cols`, each min-max quantized to
    * `bitsPerCol` bits and bit-interleaved. Quantization bounds come in
    * as literals (one tiny agg on the caller side) so the expression
    * stays a pure per-row codegen'd column — no window, no shuffle. */
  def zValue(cols: Seq[(Column, Double, Double)], bitsPerCol: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bitsPerCol > 0 && bitsPerCol * cols.size <= 62,
      s"bitsPerCol=$bitsPerCol × ${cols.size} cols must fit a long")
    val maxQ = (1L << bitsPerCol) - 1
    val quantized = cols.map { case (c, lo, hi) =>
      val unit = (c - lit(lo)) / lit(math.max(hi - lo, Double.MinPositiveValue))
      least(greatest(round(unit * maxQ).cast("long"), lit(0L)), lit(maxQ))
    }
    // interleave: output bit (b * nCols + i) = bit b of column i
    val n = cols.size
    (0 until bitsPerCol).flatMap { b =>
      quantized.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `nFiles` z-ordered parquet files at `path`:
    * range-partition on the z-value (so files own contiguous curve
    * segments), sort within partitions (so row groups within a file are
    * tight too), write. Bounds for quantization are taken from one
    * min/max aggregate over the input. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    nFiles: Int, bitsPerCol: Int = 16): Unit = {
    val bounds = df.agg(
      zCols.map(c => min(col(c)).cast("double")).head,
      (zCols.map(c => min(col(c)).cast("double")).tail ++
        zCols.map(c => max(col(c)).cast("double"))): _*).head()
    val n = zCols.size
    val specs = zCols.zipWithIndex.map { case (c, i) =>
      (col(c).cast("double"), bounds.getDouble(i), bounds.getDouble(n + i))
    }
    df.withColumn("__z", zValue(specs, bitsPerCol))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert index of exactly TWO columns, min-max quantized to
    * `bitsPerCol` bits each ([[graft.plans.HilbertIndex2D]] — a
    * codegen'd per-row expression, no window, no shuffle). Same calling
    * contract as [[zValue]]; prefer it for 2-D range-scan layouts: the
    * Hilbert curve has no inter-quadrant seams, so contiguous curve
    * segments (= files) get tighter bounding boxes than Z-order, the
    * quantity row-group min/max skipping feeds on. For > 2 dims use
    * [[zValue]] (the d-dimensional Hilbert transform buys little over
    * Z once the per-dim bit budget shrinks). */
  def hilbertValue(cols: Seq[(Column, Double, Double)], bitsPerCol: Int): Column = {
    require(cols.size == 2, s"hilbertValue is 2-D, got ${cols.size} columns")
    require(bitsPerCol > 0 && bitsPerCol <= 31, s"bad bitsPerCol $bitsPerCol")
    val maxQ = (1L << bitsPerCol) - 1
    val Seq(qx, qy) = cols.map { case (c, lo, hi) =>
      val unit = (c - lit(lo)) / lit(math.max(hi - lo, Double.MinPositiveValue))
      least(greatest(round(unit * maxQ).cast("long"), lit(0L)), lit(maxQ))
    }
    org.apache.spark.sql.graft.PlanBridge.columnOf(
      graft.plans.HilbertIndex2D(
        org.apache.spark.sql.graft.PlanBridge.expressionOf(qx),
        org.apache.spark.sql.graft.PlanBridge.expressionOf(qy),
        bitsPerCol))
  }

  /** Rewrite `df` into `nFiles` Hilbert-ordered parquet files at
    * `path` — [[writeZOrdered]] with the curve swapped. */
  def writeHilbertOrdered(df: DataFrame, path: String, curveCols: Seq[String],
                          nFiles: Int, bitsPerCol: Int = 16): Unit = {
    val bounds = df.agg(
      curveCols.map(c => min(col(c)).cast("double")).head,
      (curveCols.map(c => min(col(c)).cast("double")).tail ++
        curveCols.map(c => max(col(c)).cast("double"))): _*).head()
    val n = curveCols.size
    val specs = curveCols.zipWithIndex.map { case (c, i) =>
      (col(c).cast("double"), bounds.getDouble(i), bounds.getDouble(n + i))
    }
    df.withColumn("__h", hilbertValue(specs, bitsPerCol))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-style partitioned parquet write: one directory per distinct
    * value combination of `partCols` (`col=value/...` paths). The scan
    * side then prunes whole directories from a predicate on the
    * partition columns BEFORE listing files — the coarsest and cheapest
    * skipping tier, ahead of row-group stats and z-ordering. Choose
    * partition columns with bounded cardinality (lang, date, source);
    * high-cardinality partitioning produces the small-file problem
    * [[compact]] exists to fix. */
  def writeHivePartitioned(df: DataFrame, path: String,
                           partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "writeHivePartitioned needs partition columns")
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
  }

  /** Compact a parquet directory to ~`targetBytes` files: read, coalesce
    * to ceil(total/target) partitions (narrow — no shuffle), rewrite to
    * `outPath`. The file-count floor is 1; data is byte-identical
    * content-wise (row order within files may change). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): Unit = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val total = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
  }
}
