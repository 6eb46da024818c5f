package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Cusum

/** Pins the two-level CUSUM decomposition against the naive
  * single-window form on fixtures built to stress the seams: bucket
  * boundaries, same-instant ties, negative swings, and single-row
  * buckets. Exact integer arithmetic means the two forms must agree
  * BIT-FOR-BIT — any carry error or tie mis-pick is a hard failure,
  * not a tolerance question.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-window reference: n·prefix − i·total, one window per
    * key — the spelling the q169 oracle replays. */
  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy($"k").orderBy($"tus", $"tie")
      .rowsBetween(Window.unboundedPreceding, 0)
    val t = df.groupBy($"k")
      .agg(sum($"cents").cast(dec).as("total"), count(lit(1)).cast(dec).as("n"))
    df.join(broadcast(t), Seq("k"))
      .withColumn("pre", sum($"cents").over(w).cast(dec))
      .withColumn("i", count(lit(1)).over(w).cast(dec))
      .withColumn("dev", abs($"n" * $"pre" - $"i" * $"total"))
      .groupBy($"k")
      .agg(first($"n".cast("long")).as("n"),
        max(struct($"dev", (-$"tus").as("nt"))).as("m"))
      .select($"k", $"n", $"m.dev".as("peak_dev"), (-$"m.nt").as("peak_tus"))
  }

  private def check(rows: Seq[(String, Long, Long, Long)], bucketUs: Long): Unit = {
    val df = rows.toDF("k", "tus", "tie", "cents")
    rowsOf(Cusum.peakByKey(df, "k", "tus", "tie", "cents", bucketUs)) shouldBe
      rowsOf(naive(df))
  }

  describe("Cusum.peakByKey") {
    it("matches the naive form across bucket seams and sign swings") {
      val rows = (0L until 200L).map { i =>
        // deterministic sawtooth with a level shift at i=120
        val v = (if (i < 120) (i % 7) - 3 else (i % 7) + 2) * 100
        ("a", 1000L * i, i, v)
      } ++ (0L until 50L).map(i => ("b", 999L * i, i, -((i % 5) * 10)))
      // bucket width 7ms → ~29 buckets for a, misaligned seams for b
      check(rows, bucketUs = 7000L)
    }

    it("handles same-instant ties ordered by the tie column") {
      val rows = Seq(
        ("t", 100L, 2L, 500L), ("t", 100L, 1L, -500L),
        ("t", 200L, 3L, 100L), ("t", 200L, 4L, -100L))
      check(rows, bucketUs = 150L)
    }

    it("degenerates correctly to one bucket and to one-row buckets") {
      val rows = (0L until 40L).map(i => ("k", i, i, (i % 3) * 7 - 5))
      check(rows, bucketUs = 1L)     // every row its own bucket
      check(rows, bucketUs = 1000L)  // all rows one bucket
    }
  }
}
