package graft

import org.apache.spark.sql.functions._
import graft.sources.Readers

/** S7 JDBC source/sink against embedded Derby (in-memory, zero setup —
  * the same engine Spark ships for its metastore): round-trip plus the
  * partitioned-read contract (numPartitions range slices, no row lost
  * outside the bounds). */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  it("round-trips a table and splits the read into range partitions") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    Readers.writeJdbc(orders, url, "orders_rt")
    val bounds = orders.agg(min($"o_orderkey"), max($"o_orderkey")).head
    val back = Readers.jdbc(spark, url, "orders_rt",
      "o_orderkey", bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
    back.rdd.getNumPartitions shouldBe 4
    back.count() shouldBe orders.count()
    back.agg(sum($"o_orderkey"), round(sum($"o_totalprice"), 2)).head shouldBe
      orders.agg(sum($"o_orderkey"), round(sum($"o_totalprice"), 2)).head
  }

  it("keeps rows outside the partition bounds (bounds split, not filter)") {
    val df = Seq((1L, "a"), (50L, "b"), (999L, "c")).toDF("id", "v")
    Readers.writeJdbc(df, url, "bounds_t")
    // deliberately narrow bounds: stride covers [10, 20) but edge
    // partitions are unbounded below/above, so all 3 rows survive
    val back = Readers.jdbc(spark, url, "bounds_t", "id", 10L, 20L, 3)
    back.count() shouldBe 3L
  }
}
