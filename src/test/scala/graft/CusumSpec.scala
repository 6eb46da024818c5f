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

  describe("Cusum.upwardAlarms") {
    it("matches the textbook recursion max(0, S+x−μ) via the running-min identity") {
      // deterministic series with a genuine upward level shift
      val rows = (0L until 300L).map { i =>
        val v = if (i < 200) (i % 9) - 4 else (i % 9) + 6
        ("k", i, i, v * 10)
      }
      val df = rows.toDF("k", "tus", "tie", "cents")
      val got = Cusum.upwardAlarms(df, "k", "tus", "tie", "cents", hPermille = 2)
        .collect().head
      // direct recursion in exact BigInt arithmetic
      val cents = rows.map(_._4.toLong)
      val n = BigInt(cents.size); val total = BigInt(cents.sum)
      val h = n * total.abs * 2
      var s = BigInt(0); var alarms = 0L; var first: Option[Long] = None
      cents.zipWithIndex.foreach { case (c, i) =>
        s = (s + n * c - total).max(0)
        if (1000 * s > h) { alarms += 1; if (first.isEmpty) first = Some(i.toLong) }
      }
      got.getLong(2) shouldBe alarms
      alarms should be > 0L // the fixture must actually drift
      got.getLong(3) shouldBe first.get
    }

    it("the two-level decomposition alarms bit-identically across bucket seams") {
      val rows = (0L until 400L).map { i =>
        val v = if (i < 250) (i % 11) - 5 else (i % 11) + 4
        ("a", 997L * i, i, v * 10)
      } ++ (0L until 60L).map(i => ("b", 37L * i, i, (i % 3) + 1))
      val df = rows.toDF("k", "tus", "tie", "cents")
      rowsOf(Cusum.upwardAlarmsScalable(df, "k", "tus", "tie", "cents",
        hPermille = 2, bucketUs = 5000L)) shouldBe
        rowsOf(Cusum.upwardAlarms(df, "k", "tus", "tie", "cents",
          hPermille = 2))
    }

    it("a drift-free series raises no alarms and a null first instant") {
      // positive mean (|total| > 0) so the threshold is non-degenerate
      val df = (0L until 100L).map(i => ("k", i, i, (i % 5) + 1))
        .toDF("k", "tus", "tie", "cents")
      val r = Cusum.upwardAlarms(df, "k", "tus", "tie", "cents", hPermille = 500)
        .collect().head
      r.getLong(2) shouldBe 0L
      r.isNullAt(3) shouldBe true
    }
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
