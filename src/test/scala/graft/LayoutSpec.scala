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

  it("hilbert index is the continuous curve: exact small grid, bijective, adjacent") {
    import graft.plans.HilbertIndex2D.xy2d
    // 2×2 grid — the canonical U shape
    xy2d(1, 0, 0) shouldBe 0L
    xy2d(1, 0, 1) shouldBe 1L
    xy2d(1, 1, 1) shouldBe 2L
    xy2d(1, 1, 0) shouldBe 3L
    // 16×16: a bijection, and consecutive indices are ALWAYS
    // grid-adjacent — the continuity property Z-order lacks (and the
    // reason Hilbert segments have tighter bounding boxes)
    val pts = for { x <- 0 until 16; y <- 0 until 16 }
      yield (xy2d(4, x.toLong, y.toLong), (x, y))
    pts.map(_._1).sorted shouldBe (0 until 256).map(_.toLong)
    pts.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1
      case _ =>
    }
  }

  it("hilbert files bound at most z-order's boxes on the same data (the skip metric)") {
    val df = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"user_id".cast("double").as("u"), $"value")
    val zOut = java.nio.file.Files.createTempDirectory("cmp_z").toString
    val hOut = java.nio.file.Files.createTempDirectory("cmp_h").toString
    Layout.writeZOrdered(df, zOut, Seq("u", "value"), nFiles = 16)
    Layout.writeHilbertOrdered(df, hOut, Seq("u", "value"), nFiles = 16)
    // per-file bounding-box AREA (span product, normalized): what a 2-D
    // range predicate's row-group overlap is proportional to
    def avgArea(p: String): Double = {
      val back = spark.read.parquet(p).withColumn("f", input_file_name())
      val spans = back.groupBy($"f").agg(
        (max($"u") - min($"u")).as("su"), (max($"value") - min($"value")).as("sv"))
      val g = df.agg(max($"u") - min($"u"), max($"value") - min($"value")).head
      spans.agg(avg($"su" * $"sv")).head.getDouble(0) / (g.getDouble(0) * g.getDouble(1))
    }
    val (za, ha) = (avgArea(zOut), avgArea(hOut))
    withClue(s"hilbert avg box $ha vs z-order $za: ") { ha should be <= za }
    // content-neutral
    spark.read.parquet(hOut).agg(count(lit(1)), round(sum($"value"), 2)).head shouldBe
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
