package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Layout: z-order clustering narrows per-file min/max spans on EVERY
  * z-dimension (the property parquet skipping feeds on), and compaction
  * reduces file count without changing data. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  it("z-ordered files cluster both dimensions at once") {
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"user_id".cast("double").as("u"), $"value")
    Layout.writeZOrdered(df, out, Seq("u", "value"), nFiles = 16)

    // measure per-file spans via the input_file_name of the rewritten data
    val back = spark.read.parquet(out)
      .withColumn("f", input_file_name())
    def avgSpanFraction(c: String): Double = {
      val g = back.groupBy($"f").agg((max(col(c)) - min(col(c))).as("span"))
      val globalSpan = df.agg(max(col(c)) - min(col(c))).head.getDouble(0)
      g.agg(avg($"span")).head.getDouble(0) / globalSpan
    }
    // a 16-file z-layout over 2 uniform dims ≈ 4×4 grid → ~0.25 span per
    // dim; a single-column sort would leave the OTHER dim at ~1.0
    avgSpanFraction("u") should be < 0.6
    avgSpanFraction("value") should be < 0.6
    // and no rows were lost or changed
    back.agg(count(lit(1)), round(sum($"value"), 2)).head shouldBe
      df.agg(count(lit(1)), round(sum($"value"), 2)).head
  }

  it("hive-partitioned write prunes non-matching directories at scan time") {
    val out = java.nio.file.Files.createTempDirectory("hivepart").toString
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    Layout.writeHivePartitioned(df, out, Seq("lang"))
    // one directory per language on disk
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName)
    dirs.toSet.map((s: String) => s.takeWhile(_ != '=')) shouldBe Set("lang")

    // a partition predicate must reach the scan as a partition filter:
    // only files under lang=en may be touched (AQE hides the scan node
    // behind query stages, so disable it for the plan assert)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pruned = spark.read.parquet(out).filter($"lang" === "en")
      val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
      files should not be empty
      all(files) should include("lang=en")
      val scan = pruned.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      scan.partitionFilters should not be empty
      // and content round-trips (partition column folded back in)
      pruned.count() shouldBe df.filter($"lang" === "en").count()
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  it("compact merges small files and preserves the data") {
    val in = java.nio.file.Files.createTempDirectory("cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("cmp_out").toString
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
    df.repartition(20).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.count(f => f.getName.endsWith(".parquet"))
    parquetFiles(in) shouldBe 20
    Layout.compact(spark, in, out, targetBytes = 512L * 1024)
    parquetFiles(out) should be < 20
    spark.read.parquet(out).agg(count(lit(1)), round(sum($"o_totalprice"), 2)).head shouldBe
      df.agg(count(lit(1)), round(sum($"o_totalprice"), 2)).head
  }
}
