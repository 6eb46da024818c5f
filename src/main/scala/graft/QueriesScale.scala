package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale-operator gate queries: shapes whose *point* is cluster-scale
  * behavior (skew mitigation), gated by proving they return exactly the
  * plain-shape answer on real data.
  */
object QueriesScale {
  import Queries.Q

  // ---------------------------------------------------------------- q44
  /** Two-phase salted aggregation over lineitem supplier keys: phase 1
    * aggregates on (key, salt) so one hot key's partial state spreads
    * over 8 tasks, phase 2 merges partials. The oracle is the plain
    * GROUP BY — salting must never change the answer. Quantities sum
    * as integers (exact under any phase split); max/count are
    * order-free, so the result is bit-stable cross-engine. */
  val q44SaltedAgg: Q = (s, dir) => {
    import s.implicits._
    SkewJoin.saltedAggregate(
      Tables.lineitem(s, dir).select($"l_suppkey", $"l_quantity", $"l_extendedprice"),
      keys = Seq("l_suppkey"), saltFactor = 8,
      partials = Seq(
        sum(floor($"l_quantity").cast("long")).as("p_qty"),
        count(lit(1)).as("p_n"),
        max($"l_extendedprice").as("p_maxp")),
      finals = Seq(
        sum($"p_qty").as("sum_qty"),
        sum($"p_n").as("n"),
        round(max($"p_maxp"), 2).as("max_price")))
      .orderBy($"l_suppkey")
  }
  val q44Sql: String =
    """SELECT l_suppkey,
      |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  count(*) AS n, round(max(l_extendedprice), 2) AS max_price
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** Registry: name → (spark program, oracle sql). */
  val catalog: Seq[(String, Q, Option[String])] = Seq(
    ("q44_salted_agg", q44SaltedAgg, Some(q44Sql)),
  )
}
