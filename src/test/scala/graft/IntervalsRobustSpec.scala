package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{Intervals, Normalize, Scd2}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{AttrEvent, Scd2Version}

/** Hand-computed pins for the round-9 additions the aggregated gates
  * can't isolate: interval island semantics (touching vs overlapping vs
  * disjoint, half-open merge), robust-z edge behavior (zero MAD), and
  * the streaming SCD2 operator's incremental contract — closed versions
  * emit as changes arrive across micro-batches, the open version stays
  * in state, and batch mode reproduces the window build exactly.
  */
class IntervalsRobustSpec extends SparkSpec {
  import spark.implicits._

  describe("Intervals.mergeIntervals") {
    it("merges overlapping and touching, keeps disjoint separate") {
      val df = Seq(
        ("u", 0L, 10L), ("u", 5L, 20L),   // overlap → one island [0,20)
        ("u", 20L, 30L),                  // touching (half-open) → merges
        ("u", 40L, 50L),                  // gap → new island
        ("v", 0L, 5L)
      ).toDF("k", "s", "e")
      val out = Intervals.mergeIntervals(df, "k", "s", "e")
        .select($"k", $"start", $"end", $"n_merged")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      out shouldBe Set(("u", 0L, 30L, 3L), ("u", 40L, 50L, 1L), ("v", 0L, 5L, 1L))
    }

    it("contained intervals don't split an island") {
      val df = Seq(("u", 0L, 100L), ("u", 10L, 20L), ("u", 30L, 40L))
        .toDF("k", "s", "e")
      val cov = Intervals.coverage(df, "k", "s", "e").collect().head
      cov.getLong(1) shouldBe 1L   // n_islands
      cov.getLong(2) shouldBe 100L // covered
    }

    it("rejects negative-length intervals instead of corrupting the scan") {
      // r9 ADVICE: end < start previously flowed straight into the
      // running-max scan (negative coverage, garbage islands) — the
      // operator must fail loudly, not silently
      val df = Seq(("u", 0L, 10L), ("u", 50L, 40L)).toDF("k", "s", "e")
      val ex = intercept[Exception] {
        Intervals.coverage(df, "k", "s", "e").collect()
      }
      ex.getMessage should include("end < start")
      // zero-length (empty half-open) intervals remain legal
      val ok = Intervals.coverage(
        Seq(("u", 5L, 5L)).toDF("k", "s", "e"), "k", "s", "e").collect().head
      ok.getLong(2) shouldBe 0L
    }
  }

  describe("Normalize.robustZOutliers") {
    it("scores against hand-computed median/MAD and flags the spike") {
      // med = 3, residuals |x-3| = (2,1,0,1,2,97) → mad = 1.5
      val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("g", _)).toDF("g", "x")
      val out = Normalize.robustZOutliers(df, "g", "x")
      out.filter($"is_outlier").select($"x").as[Double].collect() shouldBe
        Array(100.0)
      val r = out.filter($"x" === 100.0).select($"med", $"mad", $"rz").head()
      r.getDouble(0) shouldBe 3.5 +- 1e-9 // median of 6 values interpolates
      r.getDouble(1) shouldBe 1.5 +- 1e-9
      r.getDouble(2) shouldBe (0.6745 * (100.0 - 3.5) / 1.5) +- 1e-9
    }

    it("zero MAD yields null score and false flag, never infinity") {
      val df = (Seq.fill(5)(7.0) :+ 99.0).map(("g", _)).toDF("g", "x")
      val out = Normalize.robustZOutliers(df, "g", "x")
      out.filter($"is_outlier").count() shouldBe 0
      out.select($"rz").collect().forall(_.isNullAt(0)) shouldBe true
    }
  }

  describe("EventStreams.scd2Updates") {
    def ev(uid: Long, sec: Long, id: Long, a: String): AttrEvent =
      AttrEvent(uid, new Timestamp(sec * 1000L), id, a)

    it("batch mode reproduces the Scd2 window build exactly") {
      val events = Seq(
        ev(1, 10, 1, "a"), ev(1, 20, 2, "a"), ev(1, 30, 3, "b"),
        ev(1, 40, 4, "a"), ev(2, 10, 5, "x"))
      val stateful = EventStreams.scd2Updates(events.toDS()).collect().toSet
      val windowed = Scd2.buildHistory(
        events.toDF(), "user_id", "attr", "ts", "event_id")
        .select($"user_id", $"attr", unix_micros($"valid_from"),
          unix_micros($"valid_to"), $"version")
        .collect().map(r => Scd2Version(r.getLong(0), r.getString(1),
          r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getInt(4))).toSet
      stateful shouldBe windowed
    }

    it("streaming emits closed versions incrementally, open stays in state") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[AttrEvent]
      val name = s"scd2_stream_${System.nanoTime()}"
      val query = EventStreams.scd2Updates(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(ev(1, 10, 1, "a"))
        query.processAllAvailable()
        spark.table(name).count() shouldBe 0 // only an open version so far

        mem.addData(ev(1, 20, 2, "b")) // closes version 1 across batches
        query.processAllAvailable()
        val closed = spark.table(name).as[Scd2Version].collect()
        closed shouldBe Array(Scd2Version(1L, "a", 10000000L, Some(20000000L), 1))
      } finally query.stop()
    }
  }
}
