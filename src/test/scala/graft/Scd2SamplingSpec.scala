package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Scd2}

/** Unit behavior of the round-9 additions: SCD type-2 history build
  * ([[graft.operators.Scd2]]) and deterministic bottom-k-by-hash group
  * sampling ([[graft.operators.Sampling.bottomKByHash]]). The q151/q152
  * oracle gates replay both end-to-end in DuckDB; these specs pin the
  * semantic edges the aggregated gates can't isolate: run boundaries,
  * tie-breaks, open-version closing, sub-k groups, and
  * partition-independence of the sample.
  */
class Scd2SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  describe("Scd2.buildHistory") {
    it("collapses runs into versioned half-open ranges") {
      val df = Seq(
        (1L, ts(10), "a", 100L),
        (1L, ts(20), "a", 101L), // same run
        (1L, ts(30), "b", 102L), // change
        (1L, ts(40), "a", 103L), // change back — a NEW version of a
        (2L, ts(10), "x", 200L)
      ).toDF("k", "ts", "attr", "ev")
      val h = Scd2.buildHistory(df, "k", "attr", "ts", "ev")
        .orderBy($"k", $"version")
        .select($"k", $"attr", $"version",
          unix_timestamp($"valid_from").as("from_s"),
          unix_timestamp($"valid_to").as("to_s"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      h shouldBe Array(
        (1L, "a", 1, 10L, 30L),
        (1L, "b", 2, 30L, 40L),
        (1L, "a", 3, 40L, -1L), // open current version
        (2L, "x", 1, 10L, -1L))
    }

    it("breaks same-instant ties by the tie column deterministically") {
      val df = Seq(
        (1L, ts(10), "b", 2L),
        (1L, ts(10), "a", 1L) // same ts — event_id 1 orders first
      ).toDF("k", "ts", "attr", "ev")
      val h = Scd2.buildHistory(df, "k", "attr", "ts", "ev")
        .orderBy($"version").select($"attr").as[String].collect()
      h shouldBe Array("a", "b")
    }

    it("asOf returns the covering version only") {
      val df = Seq(
        (1L, ts(10), "a", 1L), (1L, ts(30), "b", 2L)
      ).toDF("k", "ts", "attr", "ev")
      val h = Scd2.buildHistory(df, "k", "attr", "ts", "ev")
      Scd2.asOf(h, lit(ts(20))).select($"attr").as[String].collect() shouldBe
        Array("a")
      Scd2.asOf(h, lit(ts(30))).select($"attr").as[String].collect() shouldBe
        Array("b") // half-open: boundary belongs to the NEW version
    }
  }

  describe("Scd2.applyDelta") {
    it("apply(build(base), delta) equals build(base ∪ delta) across edge paths") {
      // key 1: open version continues, then changes in the delta
      // key 2: base-only, untouched by the delta (history passes through)
      // key 3: delta-only (new key, no carry-in)
      // key 4: delta's first event equals the open version's attr (run extends)
      val base = Seq(
        (1L, ts(10), "a", 1L), (1L, ts(20), "b", 2L),
        (2L, ts(10), "x", 3L),
        (4L, ts(10), "p", 4L))
      val delta = Seq(
        (1L, ts(30), "c", 5L), (1L, ts(40), "c", 6L),
        (3L, ts(35), "z", 7L),
        (4L, ts(50), "p", 8L), (4L, ts(60), "q", 9L))
      def df(xs: Seq[(Long, java.sql.Timestamp, String, Long)]) =
        xs.toDF("k", "ts", "attr", "ev")
      val applied = Scd2.applyDelta(
        Scd2.buildHistory(df(base), "k", "attr", "ts", "ev"),
        df(delta), "k", "attr", "ts", "ev")
      val full = Scd2.buildHistory(df(base ++ delta), "k", "attr", "ts", "ev")
      rowsOf(applied.select($"k", $"attr", $"valid_from", $"valid_to", $"version")) shouldBe
        rowsOf(full.select($"k", $"attr", $"valid_from", $"valid_to", $"version"))
    }
  }

  describe("Sampling.bottomKByHash") {
    it("matches the window-function spelling exactly") {
      val df = (1L to 500L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
      val agg = Sampling.bottomKByHash(df, "g", "id", k = 5)
      val win = df.withColumn("h", substring(md5($"id".cast("string")), 1, 12))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"g").orderBy($"h", $"id")))
        .where($"rank" <= 5)
        .select($"g", $"rank".cast("int").as("rank"), $"id")
      rowsOf(agg) shouldBe rowsOf(win)
    }

    it("is invariant under repartitioning (order-independent, unlike a reservoir)") {
      val df = (1L to 300L).map(i => ("g", i)).toDF("g", "id")
      val a = rowsOf(Sampling.bottomKByHash(df.repartition(1), "g", "id", 4))
      val b = rowsOf(Sampling.bottomKByHash(df.repartition(13, $"id"), "g", "id", 4))
      a shouldBe b
    }

    it("returns whole groups smaller than k") {
      val df = Seq(("g", 1L), ("g", 2L)).toDF("g", "id")
      Sampling.bottomKByHash(df, "g", "id", 10).count() shouldBe 2
    }
  }
}
