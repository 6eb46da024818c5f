package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Focused specs for the r20 optimization-round operator changes:
  * each one pins that the optimized internals compute EXACTLY what the
  * replaced form computed (the oracle gates the query surface; these
  * pin the operator contracts the optimizations lean on).
  */
class R20OptimizationSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Long, Seq[Double])*): DataFrame =
    rows.toDF("cluster", "id", "v")

  describe("VectorMeanAgg (the de-exploded unordered Lloyd mean)") {
    it("matches the exploded per-dimension avg, including ragged and empty input") {
      val df = vecs(
        (0L, 1L, Seq(1.0, 2.0, 3.0)),
        (0L, 2L, Seq(3.0, 6.0, 9.0)),
        (0L, 3L, Seq(5.0, 4.0)),          // ragged: dim 2 absent
        (1L, 4L, Seq(2.0, 2.0)),
        (1L, 5L, Seq.empty[Double]),       // empty: contributes nothing
        (2L, 6L, Seq(7.0, 8.0)))
      val agg = df.groupBy($"cluster")
        .agg(graft.functions.VectorMeanAgg($"v").as("m"))
        .select($"cluster", $"m.mean".as("centroid"))
      val exploded = df
        .select($"cluster", $"id", posexplode($"v").as(Seq("dim", "x")))
        .groupBy($"cluster", $"dim").agg(avg($"x").as("m"))
        .groupBy($"cluster")
        .agg(array_sort(collect_list(struct($"dim", $"m"))).as("pairs"))
        .select($"cluster", expr("transform(pairs, p -> p.m)").as("centroid"))
      val a = agg.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val b = exploded.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      a.keySet shouldBe b.keySet
      for (k <- a.keySet) {
        a(k).length shouldBe b(k).length
        a(k).zip(b(k)).foreach { case (x, y) => x shouldBe (y +- 1e-12) }
      }
      // per-dim counts: cluster 0 dim 2 averages over the TWO rows that
      // have it, exactly the exploded-avg semantics
      a(0L) shouldBe Seq(3.0, 4.0, 6.0)
    }

    it("yields no row content for all-null groups, like the exploded form") {
      val df = Seq((0L, 1L, null.asInstanceOf[Seq[Double]]))
        .toDF("cluster", "id", "v")
      val out = df.groupBy($"cluster")
        .agg(graft.functions.VectorMeanAgg($"v").as("m"))
        .select($"m.mean".as("c")).collect()
      out.length shouldBe 1
      out.head.isNullAt(0) shouldBe true
    }
  }

  describe("orderedMeanByGroup skew guard (r20 VERDICT item 8)") {
    val df = vecs(
      (0L, 1L, Seq(1.0, 2.0)), (0L, 2L, Seq(3.0, 4.0)),
      (1L, 3L, Seq(5.0, 6.0)))

    it("is plan- and result-identical when no bound is set") {
      val unguarded = IvfIndex.orderedMeanByGroup(df, Seq("cluster"), "v", "c")
      rowsOf(unguarded) shouldBe Seq(
        Seq(0L, Seq(2.0, 3.0)), Seq(1L, Seq(5.0, 6.0)))
    }

    it("passes groups within the bound unchanged") {
      val guarded = IvfIndex.orderedMeanByGroup(df, Seq("cluster"), "v", "c",
        maxGroupSize = Some(2L))
      rowsOf(guarded) shouldBe rowsOf(
        IvfIndex.orderedMeanByGroup(df, Seq("cluster"), "v", "c"))
    }

    it("fails fast on a group exceeding the bound") {
      val ex = intercept[Exception] {
        IvfIndex.orderedMeanByGroup(df, Seq("cluster"), "v", "c",
          maxGroupSize = Some(1L)).collect()
      }
      ex.getMessage should include("maxGroupSize")
    }

    it("drops null and empty vectors exactly as the exploded form did") {
      val ragged = Seq(
        (0L, 1L, Seq(2.0, 4.0)),
        (0L, 2L, null.asInstanceOf[Seq[Double]]),
        (0L, 3L, Seq.empty[Double])).toDF("cluster", "id", "v")
      rowsOf(IvfIndex.orderedMeanByGroup(ragged, Seq("cluster"), "v", "c")
        ) shouldBe Seq(Seq(0L, Seq(2.0, 4.0)))
    }
  }

  describe("fitGraph symmetry halving (r20 VERDICT item 1)") {
    it("equals the one-row-per-ordered-pair form bit-for-bit") {
      // irregular vectors so ties and low-order float bits are exercised
      val idx = vecs(
        (0L, 1L, Seq(0.1, 0.9, 0.3)), (0L, 2L, Seq(0.2, 0.8, 0.31)),
        (0L, 3L, Seq(0.7, 0.1, 0.05)), (0L, 4L, Seq(0.69, 0.11, 0.06)),
        (0L, 5L, Seq(0.5, 0.5, 0.5)),
        (1L, 6L, Seq(1.0, 0.0, 0.0)), (1L, 7L, Seq(0.0, 1.0, 0.0)),
        (1L, 8L, Seq(0.9, 0.1, 0.0)))
      graft.plans.GraftFunctions.register(spark)
      val naive = {
        val a = idx.select($"cluster", $"id".as("a_id"), $"v".as("av"))
        val b = idx.select($"cluster", $"id".as("b_id"), $"v".as("bv"))
        a.join(b, Seq("cluster"))
          .filter($"a_id" =!= $"b_id")
          .withColumn("cos", Similarity.cosine($"av", $"bv"))
          .groupBy($"cluster", $"a_id")
          .agg(graft.functions.TopKAgg(2, $"cos", $"b_id").as("topk"))
          .select($"cluster", $"a_id".as("id"),
            expr("transform(topk.items, x -> x.id)").as("nbrs"),
            expr("transform(topk.items, x -> x.score)").as("nscores"))
      }
      rowsOf(NswIndex.fitGraph(idx, degree = 2)) shouldBe rowsOf(naive)
    }
  }
}
