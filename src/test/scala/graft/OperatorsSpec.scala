package graft

import org.apache.spark.sql.functions._
import graft.functions.Derivations
import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  describe("KeyCorrection.correctKeys") {
    val facts = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")

    it("replaces listed keys, keeps the rest, preserves originals") {
      val issues = Seq((2L, 20L)).toDF("k", "fixed")
      val out = KeyCorrection.correctKeys(facts, issues, "k", "fixed")
      out.count() shouldBe 3
      rowsOf(out.select($"k", $"k_original")) shouldBe
        rowsOf(Seq((1L, 1L), (20L, 2L), (3L, 3L)).toDF("k", "k_original"))
    }

    it("does not fan out on a duplicated issue entry") {
      val issues = Seq((2L, 20L), (2L, 30L)).toDF("k", "fixed")
      val out = KeyCorrection.correctKeys(facts, issues, "k", "fixed")
      out.count() shouldBe 3 // dup issue row must not duplicate the fact
      out.filter($"k" === 20L).count() shouldBe 1 // min correction wins
    }

    it("handles an empty issue list") {
      val issues = Seq.empty[(Long, Long)].toDF("k", "fixed")
      KeyCorrection.correctKeys(facts, issues, "k", "fixed")
        .filter($"k" =!= $"k_original").count() shouldBe 0
    }
  }

  describe("Dedup") {
    val frags = Seq(
      (1L, 10L, "NA", 5.0), (1L, 11L, "ERR1", 7.0),
      (2L, 12L, "NA", 1.0)).toDF("id", "ord", "err", "v")

    it("combines fragments with deterministic first and sum") {
      val out = Dedup.combine(frags, Seq("id"), Seq(
        Dedup.firstBy($"err", $"ord").as("first_err"),
        Dedup.firstNonDefault($"err", "NA").as("err_nn"),
        sum($"v").as("v_sum")))
      rowsOf(out) shouldBe rowsOf(Seq(
        (1L, "NA", "ERR1", 12.0), (2L, "NA", "NA", 1.0))
        .toDF("id", "first_err", "err_nn", "v_sum"))
    }

    it("rejects an empty aggregate list") {
      an[IllegalArgumentException] should be thrownBy
        Dedup.combine(frags, Seq("id"), Seq.empty)
    }

    it("produces sorted concatenation regardless of input order") {
      val out = Dedup.combine(frags.orderBy($"ord".desc), Seq("id"),
        Seq(Dedup.sortedConcat($"ord").as("ords")))
      out.filter($"id" === 1L).head().getString(1) shouldBe "10,11"
    }
  }

  describe("Reports") {
    it("freqTable percentages sum to 100") {
      val df = Seq("a", "a", "b", "c").toDF("k")
      val out = Reports.freqTable(df, "k")
      out.agg(round(sum($"pct"), 2)).head().getDouble(0) shouldBe 100.0
    }

    it("histogram buckets by fixed width") {
      val df = Seq(0.5, 1.5, 1.7, 9.9).toDF("x")
      val out = Reports.histogram(df, $"x", 0.0, 1.0)
      rowsOf(out) shouldBe rowsOf(Seq((0, 1L), (1, 2L), (9, 1L)).toDF("bucket", "cnt"))
    }

    it("topK keeps k rows in measure order") {
      val df = Seq(("a", 3L), ("b", 9L), ("c", 5L)).toDF("k", "m")
      Reports.topK(df, 2, $"m", $"k").collect().map(_.getString(0)) shouldBe
        Array("b", "c")
    }

    it("heavyHittersApprox never misses a true heavy hitter") {
      val df = Tables.orders(spark, "/root/testdata/sf0.001")
        .select($"o_orderpriority")
      val exact = df.groupBy($"o_orderpriority").count()
      val candidates = df.select($"o_orderpriority").distinct()
      val approx = Reports.heavyHittersApprox(df, "o_orderpriority",
        candidates, minCount = 100L)
      val trueHitters = exact.filter($"count" >= 100)
        .collect().map(_.getString(0)).toSet
      val found = approx.collect().map(_.getString(0)).toSet
      // CMS only over-counts: every true hitter must be found
      trueHitters.subsetOf(found) shouldBe true
      // and estimates dominate the exact counts
      val est = approx.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.collect().foreach { r =>
        est.get(r.getString(0)).foreach(_ should be >= r.getLong(1))
      }
    }

    it("heavyHittersApprox ignores null candidates instead of crashing") {
      val df = Seq("a", "a", "a", "b").toDF("k")
      val candidates = Seq(Some("a"), None).toDF("k")
      val found = Reports.heavyHittersApprox(df, "k", candidates, minCount = 2L)
        .collect().map(_.getString(0)).toSet
      found shouldBe Set("a")
    }
  }

  describe("Validation") {
    it("detects duplicate keys and profiles nulls") {
      val df = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
      Validation.isUnique(df.na.drop(), Seq("k")) shouldBe false
      val p = Validation.keyProfile(df, "k").head()
      (p.getLong(0), p.getLong(1), p.getLong(2)) shouldBe ((4L, 2L, 1L))
    }

    it("collects observed metrics as a side effect of the main action") {
      val df = Seq(Some(1L), Some(2L), None, Some(4L)).toDF("k")
      val (observed, obs) = Validation.observed(df, "kq", "k")
      // ONE action drives both the real work and the metrics
      val kept = observed.filter($"k".isNotNull).count()
      kept shouldBe 3L
      obs.get("n_rows") shouldBe 4L // metrics see pre-filter rows
      obs.get("n_null") shouldBe 1L // (Map.apply via get(): Map[String, Any])
    }
  }

  describe("Readers.pivotEav") {
    it("widens EAV rows over an explicit code list with stable schema") {
      val eav = Seq(
        (1L, "HR", "88"), (1L, "TEMP", "37.5"),
        (2L, "HR", "92")).toDF("id", "code", "value")
      val wide = graft.sources.Readers.pivotEav(eav, "id", "code", "value",
        Seq("HR", "TEMP", "SPO2"))
      wide.columns.toSeq shouldBe Seq("id", "HR", "TEMP", "SPO2")
      val r2 = wide.filter($"id" === 2L).head()
      r2.getString(1) shouldBe "92"
      r2.isNullAt(2) shouldBe true // absent code → null, column still present
      r2.isNullAt(3) shouldBe true
    }
  }

  describe("Derivations") {
    it("combines date+time, derives spans and hour-of-day") {
      val df = Seq(("2020-03-01", "08:30:00")).toDF("d", "t")
      val out = df.select(
        Derivations.combineDateTime($"d", $"t").as("ts"),
        Derivations.hourOfDay(Derivations.combineDateTime($"d", $"t")).as("hod"))
      out.head().getDouble(1) shouldBe 8.5
      val span = Seq(("2020-01-01 00:00:00", "2020-01-02 00:00:00"))
        .toDF("a", "b")
        .select(Derivations.spanMinutes(to_timestamp($"a"), to_timestamp($"b")))
        .head().getDouble(0)
      span shouldBe 1440.0
    }

    it("computes BMI and lenient casts") {
      Seq(("80", "200")).toDF("w", "h")
        .select(Derivations.bmi($"w", $"h")).head().getDouble(0) shouldBe 20.0
      Seq(("7.5"), ("junk")).toDF("s")
        .select(Derivations.lenientDouble($"s").as("d"))
        .collect().map(r => Option(r.get(0))) shouldBe Array(Some(7.5), None)
    }
  }
}
