package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  describe("PageRank.pageRankFixedPoint") {
    it("a symmetric pair is a fixed point at the initial mass") {
      val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
      val out = PageRank.pageRankFixedPoint(edges, iterations = 3)
        .orderBy($"node").collect().map(r => (r.getString(0), r.getLong(1)))
      // each node's sole contribution is the other's full rank, so
      // 0.15·S + 0.85·S = S every round
      out shouldBe Array(("a", 1000000000L), ("b", 1000000000L))
    }

    it("matches the hand-computed star-graph update exactly") {
      val star = Seq("l1", "l2", "l3").flatMap(l => Seq(("hub", l), (l, "hub")))
        .toDF("src", "dst")
      val out = PageRank.pageRankFixedPoint(star, iterations = 1)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // hub: 150e6 + (85 · 3·(1e9 div 1)) div 100 = 2_700_000_000
      // leaf: 150e6 + (85 · (1e9 div 3)) div 100 = 433_333_333
      out("hub") shouldBe 2700000000L
      Seq("l1", "l2", "l3").foreach(l => out(l) shouldBe 433333333L)
    }

    it("is partitioning-independent (the point of fixed-point arithmetic)") {
      val edges = (1 to 200).flatMap { i =>
        Seq((s"u$i", s"u${i % 7}"), (s"u${i % 7}", s"u$i"))
      }.toDF("src", "dst")
      val a = PageRank.pageRankFixedPoint(edges.repartition(1), 3)
        .orderBy($"node").collect().toSeq
      val b = PageRank.pageRankFixedPoint(edges.repartition(13), 3)
        .orderBy($"node").collect().toSeq
      a shouldBe b
    }

    it("redistributes dangling-node mass exactly (hand-computed a→b)") {
      // N=2, sink b. Iter 1: contrib(b)=1e9; sinkMass=rank(b)=1e9,
      // share = 1e9 div 2 = 5e8.
      // a: 150e6 + (85·(0+5e8)) div 100      = 575_000_000
      // b: 150e6 + (85·(1e9+5e8)) div 100    = 1_425_000_000
      // total stays exactly 2e9 — no mass leaks through the sink
      val out = PageRank.pageRankFixedPoint(
        Seq(("a", "b")).toDF("src", "dst"), iterations = 1)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out("a") shouldBe 575000000L
      out("b") shouldBe 1425000000L
    }

    it("conserves total mass within truncation on a sink-heavy star") {
      // 50 pure sinks fed by one hub: without redistribution 50/51 of
      // the mass would drain to teleport-only within a few iterations
      val edges = (1 to 50).map(i => ("hub", s"s$i")).toDF("src", "dst")
      val total = PageRank.pageRankFixedPoint(edges, iterations = 5)
        .agg(sum($"rank")).head().getLong(0)
      // per-iteration truncation loss < E + N + 99·N units of 10⁻⁹
      math.abs(total - 51L * 1000000000L) should be < 1000000L
    }

    it("rejects bad parameters") {
      val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
      an[IllegalArgumentException] should be thrownBy
        PageRank.pageRankFixedPoint(edges, iterations = -1)
      an[IllegalArgumentException] should be thrownBy
        PageRank.pageRankFixedPoint(edges, 1, dampingPct = 100)
    }
  }
}
