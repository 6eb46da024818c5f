package graft

import org.apache.spark.sql.functions._
import graft.operators.{Failpoints, IvfIndex, NswIndex, PqIndex, TextDedup}
import graft.tools.StoreDoctor

/** [[graft.tools.StoreDoctor]] driven across all four store families,
  * with crash-injected fixtures ([[graft.operators.Failpoints]]): a
  * healthy store audits clean, a crashed refresh surfaces its orphan
  * generation, an interrupted NSW maintenance surfaces its pending
  * marker (the state serving reads silently ignore), and every error
  * finding names a remedy that actually clears it. */
class StoreDoctorSpec extends SparkSpec {
  import spark.implicits._

  private val boom = new RuntimeException("injected crash")
  private def crashAt(point: String): String => Unit =
    p => if (p == point) throw boom

  private def embeddings = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))

  private def errors(fs: Seq[StoreDoctor.Finding]) =
    fs.filter(_.severity == "error")
  private def kinds(fs: Seq[StoreDoctor.Finding], sev: String) =
    fs.filter(_.severity == sev).map(_.kind)

  describe("StoreDoctor: two-tier store") {
    it("audits a healthy store clean, flags a crashed refresh's orphan generation and tombstone weight") {
      val e = embeddings.localCheckpoint()
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true).localCheckpoint()
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codes = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val full = indexed.select($"cluster", $"id", $"v")
      val dir = java.nio.file.Files.createTempDirectory("graft-doc-tt").toString
      PqIndex.saveTwoTier(cent, cb, codes, full, dir)
      val healthy = StoreDoctor.auditTwoTier(spark, dir)
      errors(healthy) shouldBe empty
      kinds(healthy, "ok") should contain("manifest")
      // crash-injected orphan: a refresh dies after the codes table —
      // with scratch-isolated staging the debris is the writer's OWN
      // g2__<token> dir, never a final generation path
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("twotier:after-codes")) {
          PqIndex.saveTwoTier(cent, cb, codes, full, dir)
        }
      } shouldBe boom
      val crashed = StoreDoctor.auditTwoTier(spark, dir)
      errors(crashed) shouldBe empty // readers still resolve g1 cleanly
      kinds(crashed, "warn") should contain("scratch")
      crashed.find(_.kind == "scratch").get.detail should include("g2__")
      // heavy tombstone weight recommends compaction; compacting clears it
      PqIndex.deleteFromTwoTier(spark, dir,
        e.filter($"id" % 3 === 0).select($"id"))
      kinds(StoreDoctor.auditTwoTier(spark, dir), "warn") should
        contain("tombstones")
      PqIndex.compactTwoTier(spark, dir)
      StoreDoctor.auditTwoTier(spark, dir)
        .filter(_.kind == "tombstones") shouldBe empty
      // tuning provenance: tuned store is ok; a store missing its
      // persisted sample (pre-sample-tuner layout) is flagged
      val queries = e.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      PqIndex.tuneTwoTierNProbe(spark, dir, queries, k = 5, rerank = 10,
        nProbes = Seq(1, 2), recallFloor = 1e-9, m = 4, subDim = 16): Unit
      kinds(StoreDoctor.auditTwoTier(spark, dir), "ok") should
        contain("tuning")
      graft.sources.StoreFs.deleteChild(dir, "tuning_sample")
      val noSample = StoreDoctor.auditTwoTier(spark, dir)
      kinds(noSample, "warn") should contain("tuning")
      noSample.find(_.kind == "tuning").get.detail should
        include("tuning_sample")
    }
  }

  describe("StoreDoctor: NSW store") {
    it("flags an interrupted maintenance's pending marker and a flat-vs-graph divergence; repair clears both") {
      val e = embeddings.localCheckpoint()
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true).localCheckpoint()
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val flat = java.nio.file.Files.createTempDirectory("graft-doc-nf").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-doc-ng").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 4),
        NswIndex.entryPoints(indexed, cent), nsw)
      val healthy = StoreDoctor.auditNsw(spark, flat, nsw)
      errors(healthy) shouldBe empty
      kinds(healthy, "ok") should contain("pending-maintenance")
      kinds(healthy, "ok") should contain("flat-vs-graph")
      // crash-inject an interrupted delete AFTER the flat rewrite: the
      // pending marker is on disk, the graph still cites deleted ids —
      // exactly the state serving reads do not auto-repair
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nswmaint:after-flat-rewrite")) {
          NswIndex.deleteFromNsw(spark, flat, nsw,
            e.filter($"id" % 5 === 0).select($"id"), degree = 4)
        }
      } shouldBe boom
      val pending = StoreDoctor.auditNsw(spark, flat, nsw)
      val err = errors(pending)
      err.map(_.kind) should contain("pending-maintenance")
      err.find(_.kind == "pending-maintenance").get.detail should
        include("repairNsw")
      // the named remedy clears the finding
      NswIndex.repairNsw(spark, flat, nsw, degree = 4) should be > 0
      errors(StoreDoctor.auditNsw(spark, flat, nsw)) shouldBe empty
      // flat∖graph divergence (the mid-split crash shape): a graph
      // committed from only one cell's rows while the flat store has two
      NswIndex.saveNsw(
        NswIndex.fitGraph(indexed.filter($"cluster" === 0), degree = 4),
        NswIndex.entryPoints(indexed.filter($"cluster" === 0), cent), nsw)
      val diverged = StoreDoctor.auditNsw(spark, flat, nsw)
      errors(diverged).map(_.kind) should contain("flat-vs-graph")
    }
  }

  describe("StoreDoctor: dedup store") {
    it("audits healthy, first-build-crash and crashed-refresh states") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .limit(60).select($"doc_id", $"text")
      def build(name: String, path: String): Unit =
        TextDedup.writeDedupStoreBucketed(docs, "doc_id", "text",
          shingleN = 5, k = 8, rowsPerBand = 2,
          namePrefix = name, pathPrefix = path, buckets = 4)
      val path = java.nio.file.Files
        .createTempDirectory("graft-doc-dd").toString + "/store"
      build("sdoc_dd", path)
      val healthy = StoreDoctor.auditDedup(spark, path)
      errors(healthy) shouldBe empty
      kinds(healthy, "ok") should contain("manifest")
      // crashed refresh BEFORE the swap: the writer's tables are
      // scratch-isolated, so the debris is orphaned scratch dirs —
      // warn-grade, never an error, and the committed store untouched
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("dedupstore:after-bands")) {
          build("sdoc_dd", path)
        }
      } shouldBe boom
      val crashed = StoreDoctor.auditDedup(spark, path)
      errors(crashed) shouldBe empty
      kinds(crashed, "warn") should contain("scratch")
      // crashed refresh AFTER the swap (before the manifest commit):
      // final g2 tables above the g1 manifest — the in-flight warn
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("dedupstore:after-swap")) {
          build("sdoc_dd", path)
        }
      } shouldBe boom
      val postSwap = StoreDoctor.auditDedup(spark, path)
      errors(postSwap) shouldBe empty
      kinds(postSwap, "warn") should contain("generations")
      // tombstones are reported against live fp rows
      TextDedup.deleteFromDedupStore(spark, path,
        docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
      StoreDoctor.auditDedup(spark, path)
        .filter(_.kind == "tombstones") should not be empty
      // first-build crash after the swap: tables on disk, no
      // manifest — an error state (rebuild)
      val path2 = java.nio.file.Files
        .createTempDirectory("graft-doc-dd2").toString + "/store"
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("dedupstore:after-swap")) {
          build("sdoc_dd2", path2)
        }
      } shouldBe boom
      errors(StoreDoctor.auditDedup(spark, path2))
        .map(_.kind) should contain("manifest")
      // first-build crash before the swap: only scratch debris — the
      // store reads as cleanly absent, warn-grade
      val path3 = java.nio.file.Files
        .createTempDirectory("graft-doc-dd3").toString + "/store"
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("dedupstore:after-fp")) {
          build("sdoc_dd3", path3)
        }
      } shouldBe boom
      val preSwap = StoreDoctor.auditDedup(spark, path3)
      errors(preSwap) shouldBe empty
      kinds(preSwap, "warn") should contain("scratch")
    }

    it("flags a segmented store whose head descriptor is lost instead of auditing a guess") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .limit(40).select($"doc_id", $"text")
      val path = java.nio.file.Files
        .createTempDirectory("graft-doc-desc").toString + "/store"
      TextDedup.writeDedupStoreBucketed(docs, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "sdoc_desc", pathPrefix = path, buckets = 4,
        retainGenerations = 2)
      TextDedup.appendToDedupStoreBucketed(
        docs.limit(5).select(($"doc_id" + 700000L).as("doc_id"), $"text"),
        "doc_id", "text", shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "sdoc_desc", pathPrefix = path, buckets = 4,
        retainGenerations = 2)
      errors(StoreDoctor.auditDedup(spark, path)) shouldBe empty
      // lose the head's segment descriptor: its segment set is now
      // unknowable — the audit must say so (the lenient fallback would
      // report a healthy single-segment store, the exact silent-guess
      // hazard the strict read path refuses)
      graft.sources.StoreFs.deleteFile(s"${path}_g2_segments")
      val lost = StoreDoctor.auditDedup(spark, path)
      errors(lost).map(_.kind) should contain("manifest")
      errors(lost).map(_.detail).mkString should include("descriptor")
      // the read path refuses identically
      intercept[IllegalStateException] {
        TextDedup.ingestFlagsBucketed(docs, "doc_id", "text",
          "sdoc_desc", path, shingleN = 5, k = 8, rowsPerBand = 2,
          minAgree = 4).count()
      }.getMessage should include("descriptor")
    }
  }

  describe("StoreDoctor: streaming materialized-agg store") {
    it("distinguishes healthy, torn-debris, in-flight and corrupted-marker generations") {
      // the audit is pure layout inspection (marker/data dir names),
      // so the fixture builds the layout directly
      val dir = java.nio.file.Files.createTempDirectory("graft-doc-agg").toString
      def mkData(id: Long): Unit =
        new java.io.File(s"$dir/batch_id=$id").mkdirs()
      def mark(id: Long): Unit =
        graft.sources.StoreFs.touchMarker(dir, s".gen_${id}_committed")
      StoreDoctor.auditAggStore(spark, dir)
        .map(_.severity) shouldBe Seq("info")
      // healthy: two committed generations, newest = 2
      mkData(0); mark(0); mkData(2); mark(2)
      val healthy = StoreDoctor.auditAggStore(spark, dir)
      errors(healthy) shouldBe empty
      healthy.find(_.severity == "ok").get.detail should include("batch_id=2")
      // torn debris below the watermark + an in-flight dir above it
      mkData(1); mkData(3)
      val mixed = StoreDoctor.auditAggStore(spark, dir)
      errors(mixed) shouldBe empty
      kinds(mixed, "warn") should contain allOf ("torn-writes", "generations")
      mixed.find(_.kind == "torn-writes").get.detail should
        include("batch_id=1")
      // a marker with no data dir is real corruption
      mark(5)
      val corrupt = StoreDoctor.auditAggStore(spark, dir)
      errors(corrupt).map(_.kind) should contain("generations")
      errors(corrupt).head.detail should include("5")
    }

    it("tracks the retraction overlay from retained through releasable-by-vacuum") {
      // real retract-then-vacuum fixture: the doctor must tell the
      // operator (a) while readable history predates the watermark the
      // overlay is load-bearing, and (b) once nothing readable predates
      // it the forget path has physically completed and vacuum releases
      // the overlay
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.EventStreams
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(String, Double)]
      val base = java.nio.file.Files.createTempDirectory("graft-doc-ret").toString
      val store = s"$base/store"
      val query = EventStreams.materializedAggStore(
        mem.toDF().toDF("k", "x"),
        keyCols = Seq("k"),
        batchAggs = Seq(count(lit(1)).as("n"), sum($"x").as("v")),
        mergeAggs = Seq(sum($"n").as("n"), sum($"v").as("v")),
        store = store, checkpoint = s"$base/ckpt")
      try {
        mem.addData(("a", 1.0), ("b", 10.0))
        query.processAllAvailable()
        mem.addData(("a", 4.0))
        query.processAllAvailable()
      } finally query.stop()
      EventStreams.retractFromAggStore(spark, store, Seq("a").toDF("k"))
      // watermark = 2; generations 0 and 1 are readable and predate it
      val retained = StoreDoctor.auditAggStore(spark, store)
        .filter(_.kind == "time-travel").map(_.detail).mkString
      retained should include("records deletes through generation g2")
      retained should include("retained")
      // the fold past the watermark + vacuum of pre-watermark history:
      // simulate the release crash window (generations trimmed, overlay
      // still on disk) by trimming markers+data by hand — the doctor
      // must now say the overlay is inert and vacuum releases it
      val merged = EventStreams.latestGeneration(spark, store).get
      EventStreams.writeBatchIdempotent(merged, 2L, store)
      graft.sources.StoreFs.touchMarker(store, ".gen_2_committed")
      Seq(0L, 1L).foreach { g =>
        graft.sources.StoreFs.deleteChild(store, s".gen_${g}_committed")
        graft.sources.StoreFs.deleteChild(store, s"batch_id=$g")
      }
      new java.io.File(store, "retractions").exists() shouldBe true
      val releasable = StoreDoctor.auditAggStore(spark, store)
        .filter(_.kind == "time-travel").map(_.detail).mkString
      releasable should include("inert")
      releasable should include("vacuum releases it")
      // and vacuum does release it
      EventStreams.vacuumGenerations(store, keepLast = 1)
      new java.io.File(store, "retractions").exists() shouldBe false
    }
  }

  describe("StoreDoctor: flat IVF store") {
    it("audits the layout and flags a tuning table without its sample") {
      val e = embeddings.localCheckpoint()
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true).localCheckpoint()
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val dir = java.nio.file.Files.createTempDirectory("graft-doc-ivf").toString
      IvfIndex.save(cent, indexed, dir)
      val healthy = StoreDoctor.auditIvf(spark, dir)
      errors(healthy) shouldBe empty
      kinds(healthy, "ok") should contain("layout")
      val queries = e.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      IvfIndex.tuneNProbe(spark, dir, queries, k = 5, nProbes = Seq(1, 2),
        recallFloor = 1e-9): Unit
      kinds(StoreDoctor.auditIvf(spark, dir), "ok") should contain("tuning")
      graft.sources.StoreFs.deleteChild(dir, "tuning_sample")
      kinds(StoreDoctor.auditIvf(spark, dir), "warn") should contain("tuning")
    }
  }
}
