package graft

import org.apache.spark.sql.functions._
import graft.plans.{TopKExec, TopKPerKey}

/** Specs for the custom TopKPerKey Catalyst stack: result parity with
  * the ranking window, two-phase physical planning with the exchange
  * between partial and final, and the CombineTopK optimizer rule. */
class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  private def scored = Tables.orders(spark, "/root/testdata/sf0.001")
    .select($"o_custkey", $"o_orderkey", $"o_totalprice")

  describe("TopKPerKey WITH TIES") {
    it("keeps every boundary tie, matching rank() <= k exactly") {
      // coarse score forces heavy boundary ties; include the
      // boundary-improves path (better rows arrive after ties buffered)
      val df = Seq(
        ("g", 1L, 9), ("g", 2L, 9), ("g", 3L, 7), ("g", 4L, 7),
        ("g", 5L, 7), ("g", 6L, 5), ("g", 7L, 5), ("h", 8L, 1)
      ).toDF("k", "id", "score").repartition(5, $"id") // scattered arrival
      val ties = TopKPerKey.of(df, Seq("k"), Seq(("score", true)), 3,
        withTies = true).select($"k", $"id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"score".desc)
      val oracle = df.withColumn("rk", rank().over(w)).filter($"rk" <= 3)
        .select($"k", $"id")
      rowsOf(ties) shouldBe rowsOf(oracle)
      // g: ranks are 1,1,3,3,3 → 5 rows; h: 1 row
      ties.filter($"k" === "g").count() shouldBe 5L
    }

    it("clears stale boundary ties when the cutoff improves mid-stream") {
      // one partition => deterministic arrival order: ties at 5 buffer
      // first, then better rows push the boundary past them
      val rows = Seq(("g", 1L, 5), ("g", 2L, 5), ("g", 3L, 5),
        ("g", 4L, 9), ("g", 5L, 9), ("g", 6L, 9), ("g", 7L, 9))
      val df = rows.toDF("k", "id", "score").coalesce(1)
      val out = TopKPerKey.of(df, Seq("k"), Seq(("score", true)), 2,
        withTies = true).select($"id").as[Long].collect().toSet
      out shouldBe Set(4L, 5L, 6L, 7L) // the four 9s tie at rank ≤ 2; 5s are out
    }

    it("exact-k and with-ties never combine across each other") {
      val inner = TopKPerKey.of(scored, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 5, withTies = true)
      val outer = TopKPerKey.of(inner, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      val nodes = outer.queryExecution.optimizedPlan.collect {
        case t: TopKPerKey => t }
      // both operators survive CombineTopK (different tie flags)
      nodes.map(_.withTies).toSet shouldBe Set(true, false)
    }
  }

  describe("TopKPerKey.of") {
    it("returns exactly the ranking window's rows, ties included") {
      val topk = TopKPerKey.of(scored, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
        .select($"o_custkey", $"o_orderkey")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val windowed = scored
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
        .select($"o_custkey", $"o_orderkey")
      topk.except(windowed).count() shouldBe 0L
      windowed.except(topk).count() shouldBe 0L
      topk.count() shouldBe windowed.count()
    }

    it("plans a partial and a final heap with one exchange between") {
      // AQE wraps stages in leaf QueryStageExec nodes that hide the tree
      // from collect(); plain planning shows the real operator shape
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = try {
        TopKPerKey.of(scored, Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
          .queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      val execs = plan.collect { case e: TopKExec => e.partial }
      execs.sorted shouldBe Seq(false, true) // one final, one partial
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      exchanges should have size 1
    }

    it("CombineTopK collapses stacked same-key top-k to min(k)") {
      val once = TopKPerKey.of(scored, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      val twice = TopKPerKey.of(once, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 10)
      val logical = twice.queryExecution.optimizedPlan
      val nodes = logical.collect { case t: TopKPerKey => t.k }
      nodes shouldBe Seq(3)
      // and the collapsed plan still gives top-3 rows
      twice.groupBy($"o_custkey").count()
        .agg(max($"count")).head.getLong(0) should be <= 3L
    }
  }
}
