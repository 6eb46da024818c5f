package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Packing, TextDedup}

/** The composed END-TO-END pipeline gate (r14 verdict #7): every stage
  * of the production training-data pipeline is oracle-gated separately
  * by the catalog (q105 strip, q24 quality, q28/q30 dedup, q121 pack),
  * but no single gate priced the FULL composition — the plan
  * interactions (one strip feeding four consumers, dedup survivors
  * flowing into packing, the shard sink round-trip) are exactly what a
  * real corpus build runs as ONE job. q208 runs
  *
  *   raw crawl (planted dup corpus) → HTML strip → quality filter →
  *   exact dedup → MinHash-LSH near-dup removal → token count →
  *   FFD pack → shard sink (partitioned parquet) → read-back
  *
  * and hashes a 7-row stage-metrics funnel (rows + integer weight per
  * stage) the DuckDB oracle replays stage-for-stage from the SAME
  * factored CTE texts the individual gates use
  * ([[QueriesCurate.htmlStripCtes]], [[QueriesText.minhashCtesOver]],
  * [[QueriesScale.ffdFoldCtes]] — the q203 one-text discipline, so the
  * composed gate cannot drift from the per-stage gates).
  *
  * Fixture: documents ∪ EXACT re-crawl copies (`doc_id + 100000`) ∪
  * PERTURBED copies (`doc_id + 200000`, two appended tokens) — the
  * exact-dedup stage must remove the first planting, the near-dup
  * stage the second (the crawl shell's `doc_id % 5` nav is invariant
  * mod 100000, so a copy strips to the identical main text).
  *
  * Scale shape: strip/quality/fingerprint are per-row expression
  * chains (shuffle-free); exact dedup shuffles once on the
  * fingerprint; near-dup is the banded LSH join (shuffle keys =
  * band hashes, hot buckets capped — never all-pairs); packing is one
  * bucket shuffle + per-bucket fold. The stage funnel itself is
  * metadata-sized.
  *
  * Session-cache contract (q142/q199 shape): the pipeline runs ONCE
  * per session, persisting the shard store AND the upstream funnel
  * rows beside it; steady passes re-derive the `06_shard` row from the
  * REAL shard files (the serve operation a training job runs) and read
  * the persisted funnel — cold passes re-run the whole pipeline. */
object QueriesPipeline {
  import Queries.Q

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rmTree)
    }
    f.delete(): Unit
  }

  private val pipelineCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def clearSessionCaches(): Unit = {
    import scala.jdk.CollectionConverters._
    pipelineCache.values.asScala.foreach(p => rmTree(new java.io.File(p)))
    pipelineCache.clear()
  }

  // ---------------------------------------------------------------- q208
  val q208PipelineSoak: Q = (s, dir) => {
    import s.implicits._
    val base = pipelineCache.computeIfAbsent(dir, _ => {
      val stem = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val b = s"/root/repo/target/tmp/graft_q208_$stem"
      rmTree(new java.io.File(b))
      val d = Tables.documents(s, dir).select($"doc_id", $"text")
      val plant = d
        .unionByName(d.select(($"doc_id" + 100000L).as("doc_id"), $"text"))
        .unionByName(d.select(($"doc_id" + 200000L).as("doc_id"),
          concat($"text", lit(" zz qq")).as("text")))
      // 01: strip the crawl shell back to the main content — one
      // corpus-sized expression chain, materialized once for the four
      // downstream consumers
      val stripped = plant
        .select($"doc_id", QueriesCurate.crawlShell.as("html"))
        .select($"doc_id", TextAnalysis.mainContent($"html").as("text"))
        .localCheckpoint()
      // 02: quality — token-length window + distinct-token ratio
      // (integer arithmetic: nd/len >= 0.3 without a float compare)
      val qual = stripped
        .withColumn("w", TextAnalysis.wsTokens($"text"))
        .withColumn("len", size($"w").cast("long"))
        .withColumn("nd", size(array_distinct($"w")).cast("long"))
        .filter($"len" >= 10 && $"len" <= 256 && $"nd" * 10 >= $"len" * 3)
        .select($"doc_id", $"text", $"len")
        .localCheckpoint()
      // 03: exact dedup — min doc_id per content fingerprint
      val ex = qual
        .withColumn("keep", min($"doc_id").over(org.apache.spark.sql
          .expressions.Window.partitionBy(TextAnalysis.fingerprint($"text"))))
        .filter($"doc_id" === $"keep")
        .select($"doc_id", $"text", $"len")
        .localCheckpoint()
      // 04: near-dup removal — banded MinHash-LSH pairs (the q30
      // parameters), drop the LARGER id of every verified pair
      val sh = TextDedup.shingleTable(ex, "doc_id", "text", 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nr =
        try ex.join(
          TextDedup.minHashLshPairs(sh, k = 8, rowsPerBand = 2,
              threshold = 0.3, maxBandDf = Some(1024))
            .select($"b_id".as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti").localCheckpoint()
        finally sh.unpersist()
      // 05: FFD pack at 256-token capacity, q121's bucket sizing
      val buckets = math.max(1L, math.ceil(nr.count() / 64.0).toLong).toInt
      val packed = Packing.ffdPack(nr.select($"doc_id", $"len"),
          "doc_id", "len", capacity = 256L, buckets = buckets)
        .select($"bucket", $"id".as("doc_id"), $"len".as("n_toks"), $"bin")
        .localCheckpoint()
      // 06: shard sink — the packed assignment partitioned by bucket,
      // the layout a training job's readers consume shard-by-shard
      packed.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$b/shards")
      // persist the upstream funnel beside the shards (the q199
      // audit-trail shape: steady serves from the store, not the run)
      def m(stage: String, df: DataFrame, weight: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).cast("long").as("n_rows"),
            coalesce(weight, lit(0L)).cast("long").as("weight"))
          .select(lit(stage).as("stage"), $"n_rows", $"weight")
      val binsTotal = packed.groupBy($"bucket").agg(max($"bin").as("mx"))
        .agg(coalesce(sum($"mx"), lit(0L)).cast("long").as("s"))
        .select($"s")
      m("00_plant", plant, sum(length($"text")))
        .unionByName(m("01_strip", stripped, sum(length($"text"))))
        .unionByName(m("02_quality", qual, sum($"len")))
        .unionByName(m("03_exact", ex, sum($"len")))
        .unionByName(m("04_near", nr, sum($"len")))
        .unionByName(m("05_pack", packed,
          lit(binsTotal.head().getLong(0))))
        .coalesce(1).write.mode("overwrite").parquet(s"$b/funnel")
      b
    })
    // SERVE: the funnel from the store + the 06_shard row re-derived
    // from the REAL shard files on every pass — a lossless sink means
    // read-back rows and token mass equal the pack stage's
    val back = s.read.parquet(s"$base/shards")
    val shardRow = back
      .agg(count(lit(1)).cast("long").as("n_rows"),
        coalesce(sum($"n_toks"), lit(0L)).cast("long").as("weight"))
      .select(lit("06_shard").as("stage"), $"n_rows", $"weight")
    s.read.parquet(s"$base/funnel").unionByName(shardRow)
      .orderBy($"stage")
  }

  val q208Sql: String = {
    val normSql = QueriesText.normSql
    s"""WITH plant AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000 AS doc_id, text || ' zz qq' AS text FROM documents),
       |${QueriesCurate.htmlStripCtes("plant")},
       |stext AS MATERIALIZED (
       |  SELECT doc_id, ${QueriesCurate.stripMainOf} AS text FROM kept),
       |qw AS (
       |  SELECT doc_id, text, string_split($normSql, ' ') AS w FROM stext),
       |qual AS MATERIALIZED (
       |  SELECT doc_id, text, len FROM (
       |    SELECT doc_id, text, CAST(len(w) AS BIGINT) AS len,
       |           CAST(len(list_distinct(w)) AS BIGINT) AS nd
       |    FROM qw)
       |  WHERE len >= 10 AND len <= 256 AND nd * 10 >= len * 3),
       |ex AS MATERIALIZED (
       |  SELECT doc_id, text, len FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY md5($normSql)) AS keep
       |    FROM qual)
       |  WHERE doc_id = keep),
       |${QueriesText.minhashCtesOver("SELECT doc_id, text FROM ex")},
       |neardrop AS (
       |  SELECT DISTINCT b_id FROM inter
       |  WHERE i * 1.0 / (na + nb - i) >= 0.3),
       |nr AS MATERIALIZED (
       |  SELECT doc_id, text, len FROM ex
       |  WHERE doc_id NOT IN (SELECT b_id FROM neardrop)),
       |f0 AS (SELECT doc_id, len FROM nr),
       |nb AS (
       |  SELECT CAST(greatest(1, ceil(count(*) / 64.0)) AS BIGINT) AS b FROM f0),
       |f AS (
       |  SELECT doc_id, len,
       |         ((${QueriesScale.ffdBucketDigits}) % (SELECT b FROM nb)) AS bucket
       |  FROM f0),
       |${QueriesScale.ffdFoldCtes(capacity = 256)},
       |packed AS MATERIALIZED (
       |  ${QueriesScale.ffdUnnested})
       |SELECT stage, n_rows, weight FROM (
       |  SELECT '00_plant' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
       |         COALESCE(CAST(sum(length(text)) AS BIGINT), 0) AS weight FROM plant
       |  UNION ALL
       |  SELECT '01_strip', CAST(count(*) AS BIGINT),
       |         COALESCE(CAST(sum(length(text)) AS BIGINT), 0) FROM stext
       |  UNION ALL
       |  SELECT '02_quality', CAST(count(*) AS BIGINT),
       |         COALESCE(CAST(sum(len) AS BIGINT), 0) FROM qual
       |  UNION ALL
       |  SELECT '03_exact', CAST(count(*) AS BIGINT),
       |         COALESCE(CAST(sum(len) AS BIGINT), 0) FROM ex
       |  UNION ALL
       |  SELECT '04_near', CAST(count(*) AS BIGINT),
       |         COALESCE(CAST(sum(len) AS BIGINT), 0) FROM nr
       |  UNION ALL
       |  SELECT '05_pack', CAST(count(*) AS BIGINT),
       |         (SELECT COALESCE(CAST(sum(mx) AS BIGINT), 0) FROM
       |            (SELECT max(bin) AS mx FROM packed GROUP BY bucket)) FROM packed
       |  UNION ALL
       |  SELECT '06_shard', CAST(count(*) AS BIGINT),
       |         COALESCE(CAST(sum(n_toks) AS BIGINT), 0) FROM packed)
       |ORDER BY stage""".stripMargin
  }

  val catalog: Seq[(String, Q, Option[String])] = Seq(
    ("q208_pipeline_soak", q208PipelineSoak, Some(q208Sql)),
  )
}
