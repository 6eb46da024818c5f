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
