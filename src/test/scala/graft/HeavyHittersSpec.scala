package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** 3 planted heavies (10% each) in a sea of 7000 near-unique keys. */
  private def skewed = {
    val heavies = (1 to 1000).flatMap(_ => Seq("alpha", "beta", "gamma"))
    val noise = (1 to 7000).map(i => s"noise_$i")
    (heavies ++ noise).toDF("key")
  }

  describe("MisraGriesAgg") {
    it("summary is a superset of every key above N/(k+1) under heavy eviction") {
      val n = skewed.count()
      val k = 20
      val got = skewed.repartition(8)
        .agg(MisraGriesAgg(k, $"key").as("mg"))
        .select(explode($"mg.items.key").as("key")).as[String].collect().toSet
      val truth = skewed.groupBy($"key").count()
        .filter($"count" > n / (k + 1)).select($"key").as[String].collect()
      truth should not be empty
      truth.foreach(h => got should contain(h))
      got.size should be <= k
    }
  }

  describe("MisraGriesAgg.mergeItems (the q143 driver fold)") {
    it("folding per-batch summaries preserves the superset guarantee") {
      val k = 20
      val n = skewed.count()
      // 5 "micro-batches": per-chunk summaries folded driver-side with
      // the same merge rule the Aggregator uses internally
      val chunks = skewed.withColumn("b", abs(hash($"key")) % 5)
      val folded = (0 until 5).map { b =>
        val r = chunks.filter($"b" === b)
          .agg(MisraGriesAgg(k, $"key").as("mg")).head()
        r.getStruct(0).getSeq[org.apache.spark.sql.Row](0)
          .map(x => MisraGriesAgg.Entry(x.getString(0), x.getLong(1)))
      }.foldLeft(Seq.empty[MisraGriesAgg.Entry])(
        (acc, b) => MisraGriesAgg.mergeItems(k, acc, b))
      val truth = skewed.groupBy($"key").count()
        .filter($"count" > n / (k + 1)).select($"key").as[String].collect()
      truth should not be empty
      truth.foreach(h => folded.map(_.key) should contain(h))
      folded.size should be <= k
    }
  }

  describe("HeavyHitters.heavyHitters") {
    it("returns exactly the keys above the epsilon threshold, with exact counts") {
      val out = HeavyHitters.heavyHitters(skewed, $"key", eps = 0.05)
        .orderBy($"key").collect()
      out.map(_.getString(0)) shouldBe Array("alpha", "beta", "gamma")
      out.map(_.getLong(1)) shouldBe Array(1000L, 1000L, 1000L)
      out.map(_.getDouble(2)).foreach(f => f shouldBe 0.1 +- 1e-9)
    }

    it("output is partitioning-independent even though the sketch is not") {
      val a = HeavyHitters.heavyHitters(skewed.repartition(1), $"key", 0.05)
        .orderBy($"key").collect().toSeq
      val b = HeavyHitters.heavyHitters(skewed.repartition(13), $"key", 0.05)
        .orderBy($"key").collect().toSeq
      a shouldBe b
    }

    it("is empty when no key reaches the threshold, and rejects bad eps") {
      val uniform = (1 to 1000).map(i => s"k${i % 100}").toDF("key")
      HeavyHitters.heavyHitters(uniform, $"key", eps = 0.5).count() shouldBe 0
      an[IllegalArgumentException] should be thrownBy
        HeavyHitters.heavyHitters(uniform, $"key", eps = 0.0)
    }

    it("ignores null keys") {
      val df = (Seq.fill(10)(Some("x")) ++ Seq.fill(5)(None)).toDF("key")
      val out = HeavyHitters.heavyHitters(df, $"key", eps = 0.5).collect()
      out.map(r => (r.getString(0), r.getLong(1))) shouldBe Array(("x", 10L))
    }
  }
}
