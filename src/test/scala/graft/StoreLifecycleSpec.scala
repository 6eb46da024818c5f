package graft

import org.apache.spark.sql.functions._
import graft.operators.{Failpoints, IvfIndex, PqIndex, TextDedup}

/** Failure injection for the multi-table store writers — a long-running
  * deployment WILL eventually die between two of a store's commits, and
  * the contract under test is: the store a reader then sees is either
  * the previous COMPLETE generation or CLEANLY ABSENT, never torn.
  * [[graft.operators.Failpoints]] simulates the crash by throwing at
  * named points between commits. */
class StoreLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val boom = new RuntimeException("injected crash")
  private def crashAt(point: String): String => Unit =
    p => if (p == point) throw boom

  private def corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    .limit(60).select($"doc_id", $"text")

  private def buildStore(name: String, path: String): Unit =
    TextDedup.writeDedupStoreBucketed(corpus, "doc_id", "text",
      shingleN = 5, k = 8, rowsPerBand = 2,
      namePrefix = name, pathPrefix = path, buckets = 4)

  private def verdicts(name: String, path: String) =
    TextDedup.ingestFlagsBucketed(corpus, "doc_id", "text", name, path,
      shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4)
      .orderBy($"id").collect().toSeq

  describe("writeDedupStoreBucketed generations") {
    it("a crashed refresh leaves readers on the old complete generation") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-crash").toString + "/store"
      buildStore("slc_refresh", path)
      val before = verdicts("slc_refresh", path)
      for (point <- Seq("dedupstore:after-fp", "dedupstore:after-bands")) {
        intercept[RuntimeException] {
          Failpoints.withHook(crashAt(point)) {
            buildStore("slc_refresh", path)
          }
        } shouldBe boom
        // reader still resolves generation 1 — identical verdicts, no
        // mixed-generation reads possible (gen-suffixed table names)
        verdicts("slc_refresh", path) shouldBe before
      }
      // a retry after the crash commits cleanly over the torn leftovers
      buildStore("slc_refresh", path)
      verdicts("slc_refresh", path) shouldBe before
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }

    it("a crashed first build leaves the store cleanly absent") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-first").toString + "/store"
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("dedupstore:after-fp")) {
          buildStore("slc_first", path)
        }
      } shouldBe boom
      val e = intercept[IllegalStateException] {
        verdicts("slc_first", path)
      }
      e.getMessage should include("no committed dedup store")
      // and a clean retry makes the store readable
      buildStore("slc_first", path)
      verdicts("slc_first", path).size shouldBe 60
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }
  }

  describe("dedup store retention + vacuum") {
    it("vacuums under a concurrent reader pinned to a retained generation") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-vac").toString + "/store"
      buildStore("slc_vac", path)                       // g1
      // reader PINNED to g1: the DataFrame resolved its gen-suffixed
      // tables at construction and must stay valid while g1 is retained
      val pinned = TextDedup.ingestFlagsBucketed(corpus, "doc_id", "text",
        "slc_vac", path, shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4)
        .orderBy($"id")
      val before = pinned.collect().toSeq
      // refresh WITH history: g2 commits, g1 retained for the reader
      TextDedup.writeDedupStoreBucketed(corpus, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2, namePrefix = "slc_vac",
        pathPrefix = path, buckets = 4, retainGenerations = 2)
      pinned.collect().toSeq shouldBe before            // g1 still serves
      new java.io.File(s"${path}_g1_fp").exists() shouldBe true
      // vacuum reclaims g1; new readers resolve g2 and verdicts agree
      TextDedup.vacuumDedupStore(spark, "slc_vac", path, keepLast = 1)
      new java.io.File(s"${path}_g1_fp").exists() shouldBe false
      new java.io.File(s"${path}_g2_fp").exists() shouldBe true
      verdicts("slc_vac", path) shouldBe before
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }
  }

  describe("saveTwoTier generations") {
    def fitSmall() = {
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent)
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codes = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      (cent, cb, codes, indexed.select($"cluster", $"id", $"v"))
    }
    def centSum(dir: String): (Long, Long, Long) = {
      val (c, _, codes, full) = PqIndex.loadTwoTier(spark, dir)
      (c.count(), codes.count(), full.count())
    }

    it("a crashed refresh leaves readers on the previous complete generation") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tt-crash").toString
      val (cent, cb, codes, full) = fitSmall()
      PqIndex.saveTwoTier(cent, cb, codes, full, dir)   // g1
      val before = centSum(dir)
      for (point <- Seq("twotier:after-centroids", "twotier:after-codes")) {
        intercept[RuntimeException] {
          Failpoints.withHook(crashAt(point)) {
            PqIndex.saveTwoTier(cent, cb, codes, full, dir)
          }
        } shouldBe boom
        // the manifest still names g1 — readers see the complete store
        centSum(dir) shouldBe before
      }
      // a retry commits cleanly over the torn leftovers
      PqIndex.saveTwoTier(cent, cb, codes, full, dir)
      centSum(dir) shouldBe before
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("retention keeps history for pinned readers until vacuum reclaims it") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tt-vac").toString
      val (cent, cb, codes, full) = fitSmall()
      PqIndex.saveTwoTier(cent, cb, codes, full, dir)   // g1
      val pinned = PqIndex.loadTwoTier(spark, dir)      // paths bound to g1
      val pinnedCents = pinned._1.orderBy($"cluster").collect().toSeq
      PqIndex.saveTwoTier(cent, cb, codes, full, dir,
        retainGenerations = 2)                          // g2, g1 retained
      new java.io.File(s"$dir/g1").exists() shouldBe true
      // the pinned reader's g1 paths still serve, bit-identically
      pinned._1.orderBy($"cluster").collect().toSeq shouldBe pinnedCents
      PqIndex.vacuumTwoTier(dir, keepLast = 1)          // reclaim g1
      new java.io.File(s"$dir/g1").exists() shouldBe false
      new java.io.File(s"$dir/g2").exists() shouldBe true
      centSum(dir)._1 shouldBe 2L                       // g2 resolves
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }
  }

  describe("two-tier time-travel reads (loadTwoTierAt)") {
    def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
    def fitOn(src: org.apache.spark.sql.DataFrame) = {
      val cent = IvfIndex.fitCentroids(spark, src, k = 2, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(src, cent)
      val cb = PqIndex.fitCodebooks(spark, src, m = 4, ks = 16, iterations = 1)
      val codes = PqIndex.encode(src, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      (cent, cb, codes, indexed.select($"cluster", $"id", $"v"))
    }
    def search(qs: org.apache.spark.sql.DataFrame,
               t: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                   org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) =
      PqIndex.ivfAdcSearch(spark, qs, t._3, t._4, t._1, t._2,
          m = 4, subDim = 16, k = 3, rerank = 5, nProbe = 2)
        .orderBy($"q_id", $"rank").collect().toSeq

    it("a historic generation serves the pre-refresh search; vacuum turns it into a refusal") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-tt-hist").toString
      val all = emb.localCheckpoint()
      val base = all.filter($"id" % 3 =!= 0)
      val (c1, cb1, co1, f1) = fitOn(base)
      PqIndex.saveTwoTier(c1, cb1, co1, f1, dir, retainGenerations = 2) // g1
      val (c2, cb2, co2, f2) = fitOn(all)
      PqIndex.saveTwoTier(c2, cb2, co2, f2, dir, retainGenerations = 2) // g2
      PqIndex.committedTwoTierGenerations(dir) shouldBe Seq(1L, 2L)
      val qs = all.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      // the historic read is byte-identical to a store that never
      // refreshed, and the head read is untouched by history
      val dir2 = java.nio.file.Files
        .createTempDirectory("graft-tt-hist-rb").toString
      PqIndex.saveTwoTier(c1, cb1, co1, f1, dir2)
      search(qs, PqIndex.loadTwoTierAt(spark, dir, Some(1L))) shouldBe
        search(qs, PqIndex.loadTwoTier(spark, dir2))
      search(qs, PqIndex.loadTwoTierAt(spark, dir, Some(2L))) shouldBe
        search(qs, PqIndex.loadTwoTier(spark, dir))
      intercept[IllegalStateException](
        PqIndex.loadTwoTierAt(spark, dir, Some(99L)))
        .getMessage should include("not readable")
      PqIndex.vacuumTwoTier(dir, keepLast = 1)
      PqIndex.committedTwoTierGenerations(dir) shouldBe Seq(2L)
      val ex = intercept[IllegalStateException](
        PqIndex.loadTwoTierAt(spark, dir, Some(1L)))
      ex.getMessage should include("generation 1")
      ex.getMessage should include("[2]")
    }

    it("compaction keeps tombstones while history is readable: no resurrection at a historic read") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-tt-tomb").toString
      val all = emb.localCheckpoint()
      val (c, cb, co, f) = fitOn(all)
      PqIndex.saveTwoTier(c, cb, co, f, dir, retainGenerations = 2)   // g1
      val victim = all.orderBy($"id").limit(1)
        .select($"id").collect().head.getLong(0)
      PqIndex.deleteFromTwoTier(spark, dir, Seq(victim).toDF("id"))
      PqIndex.compactTwoTier(spark, dir, retainGenerations = 2)       // g2
      // g1 still readable -> the tombstone file must OUTLIVE the
      // compact, or a historic read resurrects the deleted vector
      new java.io.File(s"$dir/tombstones").exists() shouldBe true
      // the doctor explains the retention instead of recommending a
      // compact that would not release the file
      graft.tools.StoreDoctor.auditTwoTier(spark, dir)
        .find(_.kind == "tombstones").get.detail should
        include("historical generation")
      val (_, _, codes1, full1) = PqIndex.loadTwoTierAt(spark, dir, Some(1L))
      full1.filter($"id" === victim).count() shouldBe 0L
      codes1.filter($"id" === victim).count() shouldBe 0L
      // the compacted head was written filtered — the lingering
      // tombstones match nothing there
      val (_, _, codes2, full2) = PqIndex.loadTwoTier(spark, dir)
      full2.filter($"id" === victim).count() shouldBe 0L
      // once no pre-compact generation remains readable the fold is
      // complete and a re-compact releases the file
      PqIndex.vacuumTwoTier(dir, keepLast = 1)
      PqIndex.compactTwoTier(spark, dir)                              // g3
      new java.io.File(s"$dir/tombstones").exists() shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }
  }

  describe("writer mutual exclusion (StoreFs lease)") {
    import graft.sources.StoreFs

    it("a second concurrent writer refuses; nothing is orphaned; the doctor sees every lease state") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-lease").toString + "/store"
      val marker = s"${path}__writer"
      buildStore("slc_lease", path)                      // committed g1
      val before = verdicts("slc_lease", path)

      // 1. same-process concurrency: while this thread holds the lease,
      // a refresh from ANOTHER thread refuses up front — no g2 tables,
      // manifest untouched (the race that used to clobber g2 and orphan
      // the loser's generation)
      val lease = StoreFs.acquireWriterLease(marker)
      @volatile var refusal: Throwable = null
      val t = new Thread(() =>
        try buildStore("slc_lease", path)
        catch { case e: Throwable => refusal = e })
      t.start(); t.join()
      refusal should not be null
      refusal.getMessage should include("held by another thread")
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(1L)
      StoreFs.childNames(new org.apache.hadoop.fs.Path(path)
        .getParent.toString).count(_.contains("_g2_")) shouldBe 0
      // the doctor reports the active writer as warn, not error
      val whileHeld = graft.tools.StoreDoctor.auditDedup(spark, path)
      whileHeld.filter(_.kind == "writer-lease").map(_.severity) shouldBe
        Seq("warn")
      assertCleanAudit(whileHeld)
      StoreFs.releaseWriterLease(lease)
      new java.io.File(marker).exists() shouldBe false

      // 2. cross-process concurrency: a foreign writer's marker (fresh)
      // refuses with the holder and the remedy verb in the message
      StoreFs.writeFileAtomic(marker, "otherhost:424242:deadbeef")
      val ex = intercept[RuntimeException] { buildStore("slc_lease", path) }
      ex.getMessage should include("otherhost:424242:deadbeef")
      ex.getMessage should include("breakWriterLease")
      verdicts("slc_lease", path) shouldBe before

      // 3. abandoned (crashed-writer) lease: past the TTL the doctor
      // flags it as error with the remedy, and the next writer
      // auto-breaks it and commits
      new java.io.File(marker)
        .setLastModified(System.currentTimeMillis() - 31 * 60 * 1000L) shouldBe true
      val staleFindings = graft.tools.StoreDoctor.auditDedup(spark, path)
        .filter(_.kind == "writer-lease")
      staleFindings.map(_.severity) shouldBe Seq("error")
      staleFindings.head.detail should include("breakWriterLease")
      buildStore("slc_lease", path)                      // auto-break + g2
      verdicts("slc_lease", path) shouldBe before
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(2L)
      new java.io.File(marker).exists() shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }

    it("a writer whose lease was usurped mid-write refuses at the commit point") {
      // the residual race on the lease: a writer stalls PAST the TTL,
      // a newer writer auto-breaks the lease and proceeds — when the
      // stalled writer wakes, its COMMIT must refuse (fencing at
      // writeFileAtomic) instead of renaming over the usurper's store
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent)
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codes = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val full = indexed.select($"cluster", $"id", $"v")
      val dir = java.nio.file.Files.createTempDirectory("graft-tt-fence").toString
      PqIndex.saveTwoTier(cent, cb, codes, full, dir)     // g1
      val marker = StoreFs.writerMarkerPath(dir)
      // simulate the usurpation at the failpoint between the table
      // writes and the manifest commit: break this writer's lease and
      // install the newer writer's marker (raw create — the fenced
      // writeFileAtomic is exactly what's under test)
      def usurp(): Unit = {
        StoreFs.breakWriterLease(marker)
        val (fs, p) = StoreFs.of(marker)
        val out = fs.create(p, true)
        try out.write("usurper:424242:beef".getBytes("UTF-8"))
        finally out.close()
      }
      val ex = intercept[RuntimeException] {
        Failpoints.withHook(pt => if (pt == "twotier:after-codes") usurp()) {
          PqIndex.saveTwoTier(cent, cb, codes, full, dir) // g2 attempt
        }
      }
      ex.getMessage should include("REFUSING to commit")
      // the usurper's store pointer is untouched, its lease intact
      StoreFs.readManifest(s"$dir/manifest") shouldBe Some(1L)
      StoreFs.readSmallFile(marker).map(_.trim) shouldBe
        Some("usurper:424242:beef")
      // the orphaned g2 above the manifest is warn-grade debris the
      // next commit overwrites — never an error
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
      // once the (simulated) usurper releases, a retry commits cleanly
      StoreFs.breakWriterLease(marker)
      PqIndex.saveTwoTier(cent, cb, codes, full, dir)     // g2 for real
      StoreFs.readManifest(s"$dir/manifest") shouldBe Some(2L)
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("composed verbs re-enter the lease they already hold (refit -> save -> vacuum)") {
      // every buildStore in this suite already nests
      // writeDedupStoreBucketed -> vacuumDedupStore under one lease;
      // this pins the two-tier family's deeper chain explicitly
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent)
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codes = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val dir = java.nio.file.Files.createTempDirectory("graft-tt-lease").toString
      PqIndex.saveTwoTier(cent, cb, codes,
        indexed.select($"cluster", $"id", $"v"), dir)
      PqIndex.deleteFromTwoTier(spark, dir, e.filter($"id" % 5 === 0).select($"id"))
      // refit with tombstones: refit -> loadTwoTier -> saveTwoTier ->
      // vacuumTwoTier all under ONE lease acquisition
      PqIndex.refitTwoTier(spark, dir, m = 4, subDim = 16, ks = 16,
        iterations = 1)
      new java.io.File(s"$dir/__writer").exists() shouldBe false
      val audit = graft.tools.StoreDoctor.auditTwoTier(spark, dir)
      audit.filter(_.kind == "writer-lease").map(_.severity) shouldBe Seq("ok")
      assertCleanAudit(audit)
    }

    it("a stale-lease break is compare-and-delete: a rival's fresh lease survives") {
      // the double-break race: two processes both observe writer A's
      // marker stale; the first breaks it and creates its OWN fresh
      // lease; the second's break must then be a no-op (its stale
      // observation no longer matches the marker), not a delete of the
      // rival's live lease
      val dir = java.nio.file.Files
        .createTempDirectory("graft-lease-cad").toString
      val marker = s"$dir/__writer"
      val (fs, p) = StoreFs.of(marker)
      def plant(token: String, ageMs: Long): Unit = {
        val out = fs.create(p, true)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
      }
      val ttl = 60L * 1000
      // 1. unchanged stale marker -> confirmed, deleted
      plant("crashed:1:aaaa", ageMs = 10 * ttl)
      StoreFs.breakStaleMarkerIfUnchanged(marker, "crashed:1:aaaa", ttl)
      fs.exists(p) shouldBe false
      // 2. the marker CHANGED to a rival's fresh lease between the
      //    stale observation and the break -> restored byte-identical
      plant("rival:2:bbbb", ageMs = 0)
      StoreFs.breakStaleMarkerIfUnchanged(marker, "crashed:1:aaaa", ttl)
      StoreFs.readSmallFile(marker).map(_.trim) shouldBe Some("rival:2:bbbb")
      // 3. same holder token but a refreshed mtime (no longer stale)
      //    -> restored, not broken
      plant("crashed:1:aaaa", ageMs = 0)
      StoreFs.breakStaleMarkerIfUnchanged(marker, "crashed:1:aaaa", ttl)
      StoreFs.readSmallFile(marker).map(_.trim) shouldBe Some("crashed:1:aaaa")
      // no tombstone debris in any path
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
        .filter(_.contains("__tomb")) shouldBe empty
    }

    it("a usurped FLAT-store writer refuses before its parquet write") {
      // flat stores (direct overwrite/append, no writeFileAtomic commit
      // point) fence each destructive write explicitly — a stalled
      // appendToIndex whose lease was TTL-broken and re-acquired by a
      // rival must refuse BEFORE touching the rival's files
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ivf-fence").toString + "/ivf"
      IvfIndex.save(cent, IvfIndex.assign(e, cent), dir)
      val before = spark.read.parquet(s"$dir/index").count()
      val marker = StoreFs.writerMarkerPath(dir)
      def usurp(): Unit = {
        StoreFs.breakWriterLease(marker)
        val (fs, p) = StoreFs.of(marker)
        val out = fs.create(p, true)
        try out.write("usurper:424242:beef".getBytes("UTF-8"))
        finally out.close()
      }
      val delta = e.limit(5).select(($"id" + 100000L).as("id"), $"v")
      val ex = intercept[RuntimeException] {
        Failpoints.withHook(pt => if (pt == "ivfappend:before-write") usurp()) {
          IvfIndex.appendToIndex(spark, delta, dir)
        }
      }
      ex.getMessage should include("REFUSING to commit")
      // the store is byte-count-clean: nothing appended, the usurper's
      // lease intact
      spark.read.parquet(s"$dir/index").count() shouldBe before
      StoreFs.readSmallFile(marker).map(_.trim) shouldBe
        Some("usurper:424242:beef")
      StoreFs.breakWriterLease(marker)
      IvfIndex.appendToIndex(spark, delta, dir)
      spark.read.parquet(s"$dir/index").count() shouldBe before + 5
    }
  }

  describe("appendToDedupStoreBucketed (segmented store)") {
    import graft.sources.StoreFs

    it("appended survivors classify later arrivals; compact folds the segments; verdicts match a rebuilt store") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-seg").toString + "/store"
      // pin ONE evaluation: corpus is limit(60) over a parallel scan,
      // so re-evaluation between the append action and the probe
      // action could select different rows
      val pinned = corpus.localCheckpoint()
      val base = pinned.filter($"doc_id" % 3 =!= 0)
      val delta = pinned.filter($"doc_id" % 3 === 0)
      TextDedup.writeDedupStoreBucketed(base, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_seg", pathPrefix = path, buckets = 4)  // g1
      // probe: exact copies of the DELTA docs under fresh ids — clean
      // against the base-only store, dup_exact once the delta is in
      val probe = delta.select(($"doc_id" + 100000L).as("doc_id"), $"text")
      def flags(name: String, p: String) =
        TextDedup.ingestFlagsBucketed(probe, "doc_id", "text", name, p,
          shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4)
      // against the base-only store most probes are clean (a delta
      // text could coincide with a base text, so strict-zero is not
      // assumed); after the append EVERY probe has its original stored
      val preDup = flags("slc_seg", path).filter($"dup_exact").count()
      preDup should be < delta.count()
      TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_seg", pathPrefix = path, buckets = 4)  // g2 = [g1, g2]
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(2L)
      StoreFs.readSmallFile(s"${path}_g2_segments")
        .map(_.trim.linesIterator.toSeq) shouldBe Some(Seq("g1", "g2"))
      val appended = flags("slc_seg", path).orderBy($"id").collect().toSeq
      appended.count(_.getBoolean(1)) shouldBe delta.count() // all dup_exact
      // verdict equivalence: a store REBUILT from base ∪ delta gives
      // byte-identical verdicts to the segmented append
      val path2 = java.nio.file.Files
        .createTempDirectory("graft-store-seg2").toString + "/store"
      TextDedup.writeDedupStoreBucketed(base.unionByName(delta), "doc_id",
        "text", shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_seg_rb", pathPrefix = path2, buckets = 4)
      flags("slc_seg_rb", path2).orderBy($"id").collect().toSeq shouldBe appended
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
      // compact folds the two segments into one generation; verdicts
      // unchanged, old segments vacuumed
      TextDedup.compactDedupStore(spark, "slc_seg", path, buckets = 4) // g3 = [g3]
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(3L)
      StoreFs.readSmallFile(s"${path}_g3_segments")
        .map(_.trim) shouldBe Some("g3")
      flags("slc_seg", path).orderBy($"id").collect().toSeq shouldBe appended
      val (fs, _) = StoreFs.of(path)
      fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g1_fp")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g2_fp")) shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }

    it("a usurped writer's in-flight writes stay in its own scratch; the committed store is byte-clean") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-usurp").toString + "/store"
      buildStore("slc_usurp", path)                              // g1
      val before = verdicts("slc_usurp", path)
      val marker = s"${path}__writer"
      def usurp(): Unit = {
        StoreFs.breakWriterLease(marker)
        val (fs, p) = StoreFs.of(marker)
        val out = fs.create(p, true)
        try out.write("usurper:424242:beef".getBytes("UTF-8"))
        finally out.close()
      }
      // usurped mid-append: the mh table write AFTER the usurpation
      // still lands in the stalled writer's OWN scratch dirs; the
      // fenced swap refuses before any final location is touched
      val delta = corpus.limit(10)
        .select(($"doc_id" + 50000L).as("doc_id"), $"text").localCheckpoint()
      val ex = intercept[RuntimeException] {
        Failpoints.withHook(pt => if (pt == "dedupstore:after-bands") usurp()) {
          TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
            shingleN = 5, k = 8, rowsPerBand = 2,
            namePrefix = "slc_usurp", pathPrefix = path, buckets = 4)
        }
      }
      ex.getMessage should include("REFUSING to commit")
      // committed store byte-clean: manifest on g1, NO final g2 paths,
      // the stalled writer's output confined to token-suffixed scratch
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(1L)
      val (fs, _) = StoreFs.of(path)
      Seq("fp", "bands", "mh").foreach { sfx =>
        fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g2_$sfx")) shouldBe false
      }
      val parent = new org.apache.hadoop.fs.Path(path).getParent
      val scratch = fs.listStatus(parent).map(_.getPath.getName)
        .filter(_.matches(".*_g2_(?:fp|bands|mh)__[a-zA-Z0-9]+")).toSeq
      scratch should not be empty
      // the doctor names the debris with its remedy; the usurper's
      // lease is intact; verdicts unchanged
      val audit = graft.tools.StoreDoctor.auditDedup(spark, path)
      audit.filter(_.kind == "scratch").map(_.severity) shouldBe Seq("warn")
      audit.filter(_.kind == "scratch").head.detail should include("vacuum")
      StoreFs.readSmallFile(marker).map(_.trim) shouldBe
        Some("usurper:424242:beef")
      verdicts("slc_usurp", path) shouldBe before
      // once the usurper releases, a retry appends cleanly AND sweeps
      // the orphaned scratch
      StoreFs.breakWriterLease(marker)
      TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_usurp", pathPrefix = path, buckets = 4)
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(2L)
      fs.listStatus(parent).map(_.getPath.getName)
        .filter(_.matches(".*__[a-zA-Z0-9]+$"))
        .filterNot(_.endsWith("__writer")).toSeq shouldBe empty
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }

    it("compactAfterSegments folds the append chain in place; verdicts unchanged") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-autocomp").toString + "/store"
      val pinned = corpus.localCheckpoint()
      buildStore("slc_ac", path)                                 // g1 = [g1]
      def append(offset: Long): Unit =
        TextDedup.appendToDedupStoreBucketed(
          pinned.limit(12).select(($"doc_id" + offset).as("doc_id"), $"text"),
          "doc_id", "text", shingleN = 5, k = 8, rowsPerBand = 2,
          namePrefix = "slc_ac", pathPrefix = path, buckets = 4,
          compactAfterSegments = 2)
      append(80000L)                                             // g2 = [g1, g2]
      StoreFs.readSmallFile(s"${path}_g2_segments")
        .map(_.trim.linesIterator.size) shouldBe Some(2)
      graft.tools.StoreDoctor.auditDedup(spark, path)
        .filter(_.kind == "segments").map(_.severity) shouldBe Seq("info")
      def pinnedVerdicts() =
        TextDedup.ingestFlagsBucketed(pinned, "doc_id", "text", "slc_ac", path,
          shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4)
          .orderBy($"id").collect().toSeq
      val before = pinnedVerdicts()
      // third segment exceeds the threshold: the append itself folds
      // the store back to ONE segment (g3 = [g1,g2,g3] -> g4 = [g4])
      append(90000L)
      StoreFs.readManifest(s"${path}_manifest") shouldBe Some(4L)
      StoreFs.readSmallFile(s"${path}_g4_segments")
        .map(_.trim) shouldBe Some("g4")
      graft.tools.StoreDoctor.auditDedup(spark, path)
        .filter(_.kind == "segments") shouldBe empty
      // the fold is verdict-invariant for already-stored content and
      // the folded store classifies the newest append's content too
      pinnedVerdicts() shouldBe before
      TextDedup.ingestFlagsBucketed(
          pinned.limit(12).select(($"doc_id" + 700000L).as("doc_id"), $"text"),
          "doc_id", "text", "slc_ac", path,
          shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4)
        .filter($"dup_exact").count() shouldBe 12
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }

    it("vacuum keeps segments shared with a retained generation and reclaims them after compact") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-segvac").toString + "/store"
      buildStore("slc_segvac", path)                             // g1 = [g1]
      val delta = corpus.limit(8)
        .select(($"doc_id" + 70000L).as("doc_id"), $"text").localCheckpoint()
      TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_segvac", pathPrefix = path, buckets = 4) // g2 = [g1, g2]
      // default retention (keepLast=1) vacuumed generation g1's
      // DESCRIPTOR but must keep its segment tables — g2 references them
      val (fs, _) = StoreFs.of(path)
      fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g1_fp")) shouldBe true
      verdicts("slc_segvac", path).size shouldBe 60
      // compact cuts the lineage; the next vacuum reclaims g1 and g2
      TextDedup.compactDedupStore(spark, "slc_segvac", path, buckets = 4)
      fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g1_fp")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g2_fp")) shouldBe false
      verdicts("slc_segvac", path).size shouldBe 60
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }
  }

  describe("dedup store time-travel reads (atGeneration)") {
    import graft.sources.StoreFs

    it("a historic generation classifies as the store stood then; the head sees the delta") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-tt").toString + "/store"
      val pinned = corpus.localCheckpoint()
      val base = pinned.filter($"doc_id" % 3 =!= 0)
      val delta = pinned.filter($"doc_id" % 3 === 0)
      TextDedup.writeDedupStoreBucketed(base, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_tt", pathPrefix = path, buckets = 4,
        retainGenerations = 2)                                   // g1 = [g1]
      TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_tt", pathPrefix = path, buckets = 4,
        retainGenerations = 2)                                   // g2 = [g1, g2]
      TextDedup.committedGenerations(spark, path) shouldBe Seq(1L, 2L)
      val probe = delta.select(($"doc_id" + 100000L).as("doc_id"), $"text")
      def flags(at: Option[Long]) =
        TextDedup.ingestFlagsBucketed(probe, "doc_id", "text", "slc_tt", path,
          shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4,
          atGeneration = at).orderBy($"id").collect().toSeq
      // head: every probe's original is stored
      flags(None).count(_.getBoolean(1)) shouldBe delta.count()
      flags(Some(2L)) shouldBe flags(None)
      // at g1 the delta is not yet in the store — and the historic
      // verdicts are byte-identical to a store BUILT from base only
      val atG1 = flags(Some(1L))
      atG1.count(_.getBoolean(1)).toLong should be < delta.count()
      val path2 = java.nio.file.Files
        .createTempDirectory("graft-store-tt-rb").toString + "/store"
      TextDedup.writeDedupStoreBucketed(base, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_tt_rb", pathPrefix = path2, buckets = 4)
      TextDedup.ingestFlagsBucketed(probe, "doc_id", "text", "slc_tt_rb",
        path2, shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4)
        .orderBy($"id").collect().toSeq shouldBe atG1
    }

    it("a vacuumed generation refuses and names the readable ones") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-ttvac").toString + "/store"
      buildStore("slc_ttvac", path)                              // g1 = [g1]
      val delta = corpus.limit(8)
        .select(($"doc_id" + 70000L).as("doc_id"), $"text").localCheckpoint()
      TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_ttvac", pathPrefix = path, buckets = 4) // g2, retain 1
      // default retention vacuumed g1's DESCRIPTOR while g2 still
      // references its segment — the tables exist, but reading "g1"
      // via the descriptor-absent fallback would silently return the
      // wrong store state, so it must REFUSE, not fall back
      val (fs, _) = StoreFs.of(path)
      fs.exists(new org.apache.hadoop.fs.Path(s"${path}_g1_fp")) shouldBe true
      TextDedup.committedGenerations(spark, path) shouldBe Seq(2L)
      def at(g: Long) =
        TextDedup.ingestFlagsBucketed(corpus, "doc_id", "text", "slc_ttvac",
          path, shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4,
          atGeneration = Some(g))
      val ex = intercept[IllegalStateException](at(1L))
      ex.getMessage should include("generation 1")
      ex.getMessage should include("[2]")
      intercept[IllegalStateException](at(99L)).getMessage should
        include("not readable")
    }

    it("tombstones apply to historic reads: deleted content stays deleted in history") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-tttomb").toString + "/store"
      val pinned = corpus.localCheckpoint()
      TextDedup.writeDedupStoreBucketed(pinned, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_tttomb", pathPrefix = path, buckets = 4,
        retainGenerations = 2)                                   // g1
      val delta = pinned.limit(4)
        .select(($"doc_id" + 70000L).as("doc_id"), $"text").localCheckpoint()
      TextDedup.appendToDedupStoreBucketed(delta, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_tttomb", pathPrefix = path, buckets = 4,
        retainGenerations = 2)                                   // g2
      val victim = pinned.orderBy($"doc_id").limit(1)
        .select($"doc_id").collect().head.getLong(0)
      TextDedup.deleteFromDedupStore(spark, path,
        pinned.filter($"doc_id" === victim).select($"doc_id"))
      // a probe copy of the deleted doc reads CLEAN at BOTH the head
      // and the historic generation — history is not an escape hatch
      // for deleted content (right-to-be-forgotten)
      val probe = pinned.filter($"doc_id" === victim)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text")
      Seq(None, Some(1L)).foreach { at =>
        val v = TextDedup.ingestFlagsBucketed(probe, "doc_id", "text",
          "slc_tttomb", path, shingleN = 5, k = 8, rowsPerBand = 2,
          minAgree = 4, atGeneration = at).collect().head
        withClue(s"atGeneration=$at: ") {
          v.getBoolean(1) shouldBe false // dup_exact
          v.getBoolean(2) shouldBe false // dup_near
        }
      }
    }

    it("compaction keeps tombstones while history is readable: no resurrection via atGeneration") {
      val path = java.nio.file.Files
        .createTempDirectory("graft-store-ttcomp").toString + "/store"
      val pinned = corpus.localCheckpoint()
      TextDedup.writeDedupStoreBucketed(pinned, "doc_id", "text",
        shingleN = 5, k = 8, rowsPerBand = 2,
        namePrefix = "slc_ttcomp", pathPrefix = path, buckets = 4,
        retainGenerations = 2)                                   // g1
      val ids = pinned.orderBy($"doc_id").limit(2)
        .select($"doc_id").collect().map(_.getLong(0))
      val (victim, control) = (ids(0), ids(1))
      TextDedup.deleteFromDedupStore(spark, path,
        pinned.filter($"doc_id" === victim).select($"doc_id"))
      TextDedup.compactDedupStore(spark, "slc_ttcomp", path, buckets = 4,
        retainGenerations = 2)                                   // g2
      // g1 still readable -> tombstones must OUTLIVE the compact
      new java.io.File(s"${path}_tombstones").exists() shouldBe true
      def flagsAt(id: Long, at: Option[Long]) =
        TextDedup.ingestFlagsBucketed(
          pinned.filter($"doc_id" === id)
            .select(($"doc_id" + 100000L).as("doc_id"), $"text"),
          "doc_id", "text", "slc_ttcomp", path,
          shingleN = 5, k = 8, rowsPerBand = 2, minAgree = 4,
          atGeneration = at).collect().head
      // the deleted doc's copy reads clean at the HISTORIC generation
      // (no resurrection); a surviving doc's copy still reads dup
      // there (history serves the rest)
      flagsAt(victim, Some(1L)).getBoolean(1) shouldBe false
      flagsAt(control, Some(1L)).getBoolean(1) shouldBe true
      // once no pre-compact generation remains readable the fold is
      // complete and a re-compact releases the file
      TextDedup.compactDedupStore(spark, "slc_ttcomp", path, buckets = 4)
      new java.io.File(s"${path}_tombstones").exists() shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditDedup(spark, path))
    }
  }

  describe("saveNsw generations") {
    it("crashed refresh stays on the old generation; vacuum applies the uniform policy") {
      import graft.operators.NswIndex
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val graph = NswIndex.fitGraph(indexed, degree = 3)
      val entries = NswIndex.entryPoints(indexed, cent)
      val dir = java.nio.file.Files.createTempDirectory("graft-nsw-crash").toString
      NswIndex.saveNsw(graph, entries, dir)                   // g1
      val before = NswIndex.loadNsw(spark, dir)._1.count()
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nsw:after-graph")) {
          NswIndex.saveNsw(graph, entries, dir)
        }
      } shouldBe boom
      NswIndex.loadNsw(spark, dir)._1.count() shouldBe before // still g1
      NswIndex.saveNsw(graph, entries, dir, retainGenerations = 2) // g3, g1 kept
      new java.io.File(s"$dir/g1").exists() shouldBe true
      NswIndex.vacuumNsw(dir, keepLast = 1)
      new java.io.File(s"$dir/g1").exists() shouldBe false
      NswIndex.loadNsw(spark, dir)._1.count() shouldBe before
      assertCleanAudit(
        graft.tools.StoreDoctor.auditNsw(spark, s"$dir/noflat", dir))
    }
  }

  describe("NSW time-travel reads (loadNswAt)") {
    import graft.operators.NswIndex
    def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))

    def buildPair(retain: Int): (String, String, org.apache.spark.sql.DataFrame) = {
      val e = emb.localCheckpoint()
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val fDir = java.nio.file.Files.createTempDirectory("graft-nswtt-flat").toString
      val nDir = java.nio.file.Files.createTempDirectory("graft-nswtt-nsw").toString
      IvfIndex.save(cent, indexed, fDir)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 3),
        NswIndex.entryPoints(indexed, cent), nDir, retainGenerations = retain)
      (fDir, nDir, e)
    }

    it("a historic read scrubs deleted ids everywhere; the head stays the exact rebuild") {
      val (fDir, nDir, _) = buildPair(retain = 2)
      // victims picked FROM a neighbor list, so the citation scrub is
      // observable, not vacuously true
      val (gPre, _) = NswIndex.loadNsw(spark, nDir)
      val vset = gPre.orderBy($"id").select($"nbrs")
        .head().getSeq[Long](0).take(2).toSet
      val victims = vset.toSeq.toDF("id")
      NswIndex.deleteFromNsw(spark, fDir, nDir, victims, degree = 3,
        retainGenerations = 2) should be >= 1
      NswIndex.committedNswGenerations(nDir) shouldBe Seq(1L, 2L)
      // the historic generation: no node rows, no citations, no entry
      // seats for the deleted ids — and the score lists stay aligned
      val (hg, he) = NswIndex.loadNswAt(spark, nDir, Some(1L))
      hg.filter($"id".isInCollection(vset)).count() shouldBe 0L
      hg.select(explode($"nbrs").as("n"))
        .filter($"n".isInCollection(vset)).count() shouldBe 0L
      he.filter($"entry".isInCollection(vset)).count() shouldBe 0L
      hg.filter(org.apache.spark.sql.functions.size($"nbrs") =!=
        org.apache.spark.sql.functions.size($"nscores")).count() shouldBe 0L
      // the head is the eager rebuild — untouched by the ledger
      val (hd, _) = NswIndex.loadNsw(spark, nDir)
      hd.filter($"id".isInCollection(vset)).count() shouldBe 0L
      // the doctor names the ledger (info, not error), and the SHARED
      // time-travel finding — one implementation for all four store
      // families — names the generation the ledger scrubs
      val audit = graft.tools.StoreDoctor.auditNsw(spark, fDir, nDir)
      audit.find(_.kind == "deletion-ledger").get.severity shouldBe "info"
      audit.filter(_.kind == "time-travel")
        .map(_.detail).mkString("\n") should include("g1")
      assertCleanAudit(audit)
      intercept[IllegalStateException](
        NswIndex.loadNswAt(spark, nDir, Some(99L)))
        .getMessage should include("not readable")
      // vacuum the history: g1 refuses with the readable list, and the
      // now-inert ledger is released
      NswIndex.vacuumNsw(nDir, keepLast = 1)
      NswIndex.committedNswGenerations(nDir) shouldBe Seq(2L)
      val ex = intercept[IllegalStateException](
        NswIndex.loadNswAt(spark, nDir, Some(1L)))
      ex.getMessage should include("generation 1")
      ex.getMessage should include("[2]")
      new java.io.File(s"$nDir/tombstones").exists() shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, fDir, nDir))
    }

    it("the generation-scoped ledger never scrubs a re-appended id") {
      val (fDir, nDir, e) = buildPair(retain = 3)
      val (gPre, _) = NswIndex.loadNsw(spark, nDir)
      val victim = gPre.orderBy($"id").select($"nbrs")
        .head().getSeq[Long](0).head
      NswIndex.deleteFromNsw(spark, fDir, nDir, Seq(victim).toDF("id"),
        degree = 3, retainGenerations = 3)                          // g2
      // re-ingest the deleted id under the same centroids — the
      // sibling families' compaction caveat deliberately does NOT
      // apply here: the ledger is scoped to the delete's generation
      val (cent, indexed) = IvfIndex.load(spark, fDir)
      val delta = IvfIndex.assign(e.filter($"id" === victim), cent)
        .localCheckpoint()
      NswIndex.appendToNsw(spark, nDir,
        indexed.select($"id", $"v", $"cluster"), delta, cent,
        degree = 3, retainGenerations = 3)                          // g3
      NswIndex.committedNswGenerations(nDir) shouldBe Seq(1L, 2L, 3L)
      NswIndex.loadNswAt(spark, nDir, Some(3L))._1
        .filter($"id" === victim).count() shouldBe 1L
      // generations older than the delete still scrub it; the delete's
      // own rebuild is physically clean
      NswIndex.loadNswAt(spark, nDir, Some(1L))._1
        .filter($"id" === victim).count() shouldBe 0L
      NswIndex.loadNswAt(spark, nDir, Some(2L))._1
        .filter($"id" === victim).count() shouldBe 0L
    }

    it("a delete that crashes before the flat rewrite errs conservative: history hides the ids whose deletion was requested") {
      val (fDir, nDir, _) = buildPair(retain = 2)
      val (gPre, _) = NswIndex.loadNsw(spark, nDir)
      val victim = gPre.orderBy($"id").select($"nbrs")
        .head().getSeq[Long](0).head
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nswmaint:after-pending")) {
          NswIndex.deleteFromNsw(spark, fDir, nDir, Seq(victim).toDF("id"),
            degree = 3, retainGenerations = 2)
        }
      } shouldBe boom
      // the delete never committed: the head still serves the id
      NswIndex.loadNsw(spark, nDir)._1
        .filter($"id" === victim).count() shouldBe 1L
      // but the deletion INTENT is on the ledger — a historic read of
      // g1 (the only committed generation) hides the id rather than
      // ever resurrecting content whose removal was requested
      NswIndex.loadNswAt(spark, nDir, Some(1L))._1
        .filter($"id" === victim).count() shouldBe 0L
      // the re-run completes the delete and the repair path clears the
      // pending marker
      NswIndex.deleteFromNsw(spark, fDir, nDir, Seq(victim).toDF("id"),
        degree = 3, retainGenerations = 2) should be >= 1
      NswIndex.loadNsw(spark, nDir)._1
        .filter($"id" === victim).count() shouldBe 0L
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, fDir, nDir))
    }

    it("repair adjudicates a pre-rewrite delete crash: the never-completed intent is revoked and head/history agree again") {
      val (fDir, nDir, _) = buildPair(retain = 2)
      val (gPre, _) = NswIndex.loadNsw(spark, nDir)
      val victim = gPre.orderBy($"id").select($"nbrs")
        .head().getSeq[Long](0).head
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nswmaint:after-pending")) {
          NswIndex.deleteFromNsw(spark, fDir, nDir, Seq(victim).toDF("id"),
            degree = 3, retainGenerations = 2)
        }
      } shouldBe boom
      // in the crash window the intent hides conservatively (the
      // sibling spec's pin)
      NswIndex.loadNswAt(spark, nDir, Some(1L))._1
        .filter($"id" === victim).count() shouldBe 0L
      // repair finds the id ALIVE in the flat store it re-commits —
      // the delete never physically happened — and revokes the intent
      NswIndex.repairNsw(spark, fDir, nDir, degree = 3,
        retainGenerations = 2) should be >= 1
      new java.io.File(s"$nDir/tombstones_dropped").exists() shouldBe true
      NswIndex.loadNsw(spark, nDir)._1
        .filter($"id" === victim).count() shouldBe 1L
      // agreement restored: history serves exactly what the head does
      NswIndex.loadNswAt(spark, nDir, Some(1L))._1
        .filter($"id" === victim).count() shouldBe 1L
      val head = graft.sources.StoreFs.readManifest(s"$nDir/manifest").get
      NswIndex.loadNswAt(spark, nDir, Some(head))._1
        .filter($"id" === victim).count() shouldBe 1L
      // a RE-REQUESTED delete records a fresh intent and completes:
      // history hides the id again, via the new entry
      NswIndex.deleteFromNsw(spark, fDir, nDir, Seq(victim).toDF("id"),
        degree = 3, retainGenerations = 2) should be >= 1
      NswIndex.loadNsw(spark, nDir)._1
        .filter($"id" === victim).count() shouldBe 0L
      NswIndex.loadNswAt(spark, nDir, Some(head))._1
        .filter($"id" === victim).count() shouldBe 0L
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, fDir, nDir))
    }

    it("a torn deletion-ledger append (no committed part file) reads as absent and vacuum sweeps it") {
      val (fDir, nDir, _) = buildPair(retain = 2)
      new java.io.File(s"$nDir/tombstones/_temporary").mkdirs() shouldBe true
      // historic reads, the doctor and vacuum all degrade instead of
      // throwing "unable to infer schema"
      NswIndex.loadNswAt(spark, nDir, Some(1L))._1.count() should be > 0L
      val findings = graft.tools.StoreDoctor.auditNsw(spark, fDir, nDir)
      findings.find(_.kind == "deletion-ledger").get.severity shouldBe "warn"
      findings.find(_.kind == "deletion-ledger").get.detail should
        include("torn")
      NswIndex.vacuumNsw(nDir, keepLast = 2)
      new java.io.File(s"$nDir/tombstones").exists() shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, fDir, nDir))
    }
  }

  describe("splitOversizedCells crash windows") {
    def freshIndex(): String = {
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 1,
        orderedMean = true)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-crash").toString
      IvfIndex.save(cent, IvfIndex.assign(e, cent), dir)
      dir
    }

    it("crash between index overwrite and centroid swap: loadable, nothing lost") {
      val dir = freshIndex()
      val n = spark.read.parquet(s"$dir/index").count()
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("ivfsplit:after-index-overwrite")) {
          IvfIndex.splitOversizedCells(spark, dir, maxCellSize = n / 4)
        }
      } shouldBe boom
      spark.catalog.refreshByPath(s"$dir/index")
      val (cent, indexed) = IvfIndex.load(spark, dir)
      // the documented state: fresh sub-cells probe-invisible (old
      // centroids), but every vector still present exactly once
      indexed.count() shouldBe n
      cent.count() shouldBe 2L
      // and a re-run completes the split from that state
      IvfIndex.splitOversizedCells(spark, dir, maxCellSize = n / 4) should be >= 1
      assertCleanAudit(graft.tools.StoreDoctor.auditIvf(spark, dir))
    }

    it("crash mid-centroid-swap: load rolls the commit forward") {
      for (point <- Seq("ivfsplit:after-centroid-tmp", "ivfsplit:mid-swap")) {
        val dir = freshIndex()
        val n = spark.read.parquet(s"$dir/index").count()
        intercept[RuntimeException] {
          Failpoints.withHook(crashAt(point)) {
            IvfIndex.splitOversizedCells(spark, dir, maxCellSize = n / 4)
          }
        } shouldBe boom
        spark.catalog.refreshByPath(s"$dir/index")
        spark.catalog.refreshByPath(s"$dir/centroids")
        val (cent, indexed) = IvfIndex.load(spark, dir)
        indexed.count() shouldBe n // no vector lost or duplicated
        // mid-swap: live was missing; recovery committed the complete
        // tmp table (roll-forward) — centroid count must be a coherent
        // table either way (2 pre-split or 2 + splits post-split)
        cent.count() should be >= 2L
        // every cluster present in the index is probe-visible after
        // recovery OR the documented stale-recall state (old centroids)
        val idxClusters = indexed.select($"cluster".cast("long"))
          .distinct().collect().map(_.getLong(0)).toSet
        val centClusters = cent.select($"cluster".cast("long"))
          .collect().map(_.getLong(0)).toSet
        if (point == "ivfsplit:mid-swap")
          // roll-forward: the new centroid table matches the new index
          centClusters shouldBe idxClusters
        else
          centClusters.subsetOf(idxClusters) shouldBe true
      }
    }
  }

  describe("NSW maintenance crash-resume (pending-cells marker)") {
    import graft.operators.NswIndex

    /** flat index + NSW store over the sf0.001 embeddings; returns
      * (flatDir, nswDir). */
    def freshPair(k: Int = 2): (String, String) = {
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      val cent = IvfIndex.fitCentroids(spark, e, k = k, iterations = 1,
        orderedMean = true).localCheckpoint()
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val root = java.nio.file.Files.createTempDirectory("graft-nswm").toString
      val flatDir = s"$root/flat"; val nswDir = s"$root/nsw"
      IvfIndex.save(cent, indexed, flatDir)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 3),
        NswIndex.entryPoints(indexed, cent), nswDir)
      (flatDir, nswDir)
    }

    /** graph content as comparable rows (cluster, id, nbrs). */
    def graphRows(nswDir: String): Seq[(Long, Long, Seq[Long])] =
      NswIndex.loadNsw(spark, nswDir)._1
        .select($"cluster".cast("long"), $"id".cast("long"), $"nbrs")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).toSeq)).toSeq.sortBy(t => (t._1, t._2))

    it("delete crash after the flat rewrite is repaired on the next call") {
      val (flatDir, nswDir) = freshPair()
      val delIds = spark.range(0, 20).select($"id")
      // twin store: the clean end state a successful delete produces
      val (flatDir2, nswDir2) = freshPair()
      NswIndex.deleteFromNsw(spark, flatDir2, nswDir2, delIds,
        degree = 3) should be >= 1
      val want = graphRows(nswDir2)
      // crash between the flat rewrite and the NSW commit — the
      // ADVICE window: flat already lacks the ids, graph still cites
      // them, and affected recomputes as empty on a naive re-run
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nswmaint:after-flat-rewrite")) {
          NswIndex.deleteFromNsw(spark, flatDir, nswDir, delIds, degree = 3)
        }
      } shouldBe boom
      spark.catalog.refreshByPath(s"$flatDir/index")
      NswIndex.readPendingCells(nswDir).isDefined shouldBe true
      // the stale graph really does cite deleted ids (the silent-loss
      // state the marker exists to catch)
      graphRows(nswDir).exists(_._3.exists(_ < 20)) shouldBe true
      // the next maintenance call resumes from the marker: affected is
      // empty (ids already gone from flat) but the repair still runs
      NswIndex.deleteFromNsw(spark, flatDir, nswDir, delIds, degree = 3)
      NswIndex.readPendingCells(nswDir) shouldBe None
      graphRows(nswDir) shouldBe want
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flatDir, nswDir))
    }

    it("delete crash before the flat rewrite repairs to the original content") {
      val (flatDir, nswDir) = freshPair()
      val before = graphRows(nswDir)
      val delIds = spark.range(0, 20).select($"id")
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nswmaint:after-pending")) {
          NswIndex.deleteFromNsw(spark, flatDir, nswDir, delIds, degree = 3)
        }
      } shouldBe boom
      // marker present, flat untouched: repair rebuilds to equal content
      NswIndex.repairNsw(spark, flatDir, nswDir, degree = 3) should be >= 1
      NswIndex.readPendingCells(nswDir) shouldBe None
      graphRows(nswDir) shouldBe before
      // and the delete itself still works afterwards
      NswIndex.deleteFromNsw(spark, flatDir, nswDir, delIds,
        degree = 3) should be >= 1
      graphRows(nswDir).exists(_._3.exists(_ < 20)) shouldBe false
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flatDir, nswDir))
    }

    it("split crash after the flat split is repaired, fresh cells included") {
      val (flatDir, nswDir) = freshPair()
      val n = spark.read.parquet(s"$flatDir/index").count()
      intercept[RuntimeException] {
        Failpoints.withHook(crashAt("nswmaint:after-split")) {
          NswIndex.splitOversizedNswCells(spark, flatDir, nswDir,
            maxCellSize = n / 4, degree = 3)
        }
      } shouldBe boom
      spark.catalog.refreshByPath(s"$flatDir/index")
      spark.catalog.refreshByPath(s"$flatDir/centroids")
      NswIndex.readPendingCells(nswDir).isDefined shouldBe true
      // repair rebuilds the marked + fresh cells from the post-split
      // flat store; the result equals a direct fitGraph over it
      NswIndex.repairNsw(spark, flatDir, nswDir, degree = 3) should be >= 2
      NswIndex.readPendingCells(nswDir) shouldBe None
      val (cent, idxRaw) = IvfIndex.load(spark, flatDir)
      val indexed = idxRaw.select($"id", $"v",
        $"cluster".cast("long").as("cluster")).localCheckpoint()
      val want = NswIndex.fitGraph(indexed, degree = 3)
        .select($"cluster".cast("long"), $"id".cast("long"), $"nbrs")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).toSeq)).toSeq.sortBy(t => (t._1, t._2))
      graphRows(nswDir) shouldBe want
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flatDir, nswDir))
    }
  }
}
