package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, NswIndex, PqIndex, Similarity}

/** Partitioned-NSW graph tier: exact small-case graph construction,
  * walk-order invariants, and the ladder-closing claim — recall at
  * least the IVF+PQ-ADC tier's at the same probe budget, measured on
  * the q129 instrumentation (cosine brute-force ground truth). */
class NswSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))

  describe("NswIndex.fitGraph") {
    it("links each node to its exact in-cell nearest neighbors, ties by id") {
      // two tight pairs on orthogonal axes: hand-computable cosines
      val vs = Seq(
        (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)),
        (2L, Array(0.0, 1.0)), (3L, Array(0.1, 0.9)))
        .toDF("id", "v").withColumn("cluster", lit(0))
      val g = NswIndex.fitGraph(vs, degree = 2)
        .collect().map(r => r.getLong(1) -> r.getSeq[Long](2).toSeq).toMap
      g(0L) shouldBe Seq(1L, 3L) // cos(0,1)=.9938 > cos(0,3)=.1104 > cos(0,2)=0
      g(1L) shouldBe Seq(0L, 3L)
      g(2L) shouldBe Seq(3L, 1L)
      g(3L) shouldBe Seq(2L, 1L)
    }

    it("never crosses cells") {
      val vs = Seq(
        (0L, Array(1.0, 0.0), 0), (1L, Array(0.9, 0.1), 1),
        (2L, Array(1.0, 0.1), 0), (3L, Array(0.95, 0.05), 1))
        .toDF("id", "v", "cluster")
      val g = NswIndex.fitGraph(vs, degree = 3)
        .collect().map(r => r.getLong(1) -> r.getSeq[Long](2).toSeq).toMap
      g(0L) shouldBe Seq(2L) // only its cell-mate, despite closer ids in cell 1
      g(1L) shouldBe Seq(3L)
    }
  }

  describe("NswIndex.search") {
    def fitted() = {
      val e = corpus
      val cent = IvfIndex.fitCentroids(spark, e, k = 8, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val queries = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      (e, cent, indexed, queries)
    }

    it("returns correctly ranked, correctly scored neighbors") {
      val (e, cent, indexed, queries) = fitted()
      val graph = NswIndex.fitGraph(indexed, degree = 4).localCheckpoint()
      val entries = NswIndex.entryPoints(indexed, cent)
      val out = NswIndex.search(spark, queries, graph, indexed, cent, entries,
        k = 5, nProbe = 2, ef = 16, rounds = 3).localCheckpoint()
      out.groupBy($"q_id").count().collect().foreach(_.getLong(1) shouldBe 5L)
      // ranks are 1..5 in descending cos, ties impossible at 4 decimals here
      val byQ = out.orderBy($"q_id", $"rank")
        .collect().groupBy(_.getLong(0))
      byQ.values.foreach { rows =>
        rows.map(_.getInt(1)).toSeq shouldBe (1 to 5)
        val scores = rows.map(_.getDouble(3)).toSeq
        scores.sliding(2).foreach { case Seq(a, b) => a should be >= b case _ => }
      }
      // every reported cos is the true cosine of that (query, neighbor)
      val check = out.join(queries, Seq("q_id"))
        .join(e.select($"id".as("n_id"), $"v"), Seq("n_id"))
        .withColumn("true_cos", round(Similarity.cosine($"qv", $"v"), 4))
      check.filter($"cos" =!= $"true_cos").count() shouldBe 0L
    }

    it("multi-seeding widens the visited set monotonically and stays exact") {
      val (e, cent, indexed, queries) = fitted()
      val graph = NswIndex.fitGraph(indexed, degree = 4).localCheckpoint()
      val entries = NswIndex.entryPoints(indexed, cent)
      def top(seeds: Int) = NswIndex.search(spark, queries, graph, indexed,
          cent, entries, k = 5, nProbe = 2, ef = 16, rounds = 3,
          seedsPerCell = seeds).localCheckpoint()
      val one = top(1)
      val many = top(8)
      // seedsPerCell = 1 is byte-identical to the original walk
      one.orderBy($"q_id", $"rank").collect() shouldBe
        NswIndex.search(spark, queries, graph, indexed, cent, entries,
          k = 5, nProbe = 2, ef = 16, rounds = 3)
          .orderBy($"q_id", $"rank").collect()
      // extra seeds only ADD visited candidates: per query, the
      // multi-seed top-1 cosine is >= the single-seed top-1 cosine
      val t1 = one.filter($"rank" === 1)
        .select($"q_id", $"cos".as("cos1"))
      val tm = many.filter($"rank" === 1)
        .select($"q_id", $"cos".as("cosM"))
      t1.join(tm, Seq("q_id")).filter($"cosM" < $"cos1")
        .count() shouldBe 0L
      // no duplicate neighbor may occupy two slots (the seed-dedup pin)
      many.groupBy($"q_id", $"n_id").count()
        .filter($"count" > 1).count() shouldBe 0L
      // every reported cos is still the true cosine
      val check = many.join(queries, Seq("q_id"))
        .join(e.select($"id".as("n_id"), $"v"), Seq("n_id"))
        .withColumn("true_cos", round(Similarity.cosine($"qv", $"v"), 4))
      check.filter($"cos" =!= $"true_cos").count() shouldBe 0L
    }

    it("appendToNsw reproduces the full rebuild bit-for-bit") {
      val e = corpus
      val base = e.filter($"id" % 10 < 9)
      val delta = e.filter($"id" % 10 === 9)
      val cent = IvfIndex.fitCentroids(spark, base, k = 4, iterations = 1,
        orderedMean = true)
      val idxBase = IvfIndex.assign(base, cent).localCheckpoint()
      val idxDelta = IvfIndex.assign(delta, cent).localCheckpoint()
      val dir = java.nio.file.Files.createTempDirectory("graft-nsw-app").toString
      NswIndex.saveNsw(NswIndex.fitGraph(idxBase, degree = 5),
        NswIndex.entryPoints(idxBase, cent), dir)
      NswIndex.appendToNsw(spark, dir, idxBase, idxDelta, cent, degree = 5)
      val (appended, appEntries) = NswIndex.loadNsw(spark, dir)
      val all = idxBase.unionByName(idxDelta)
      def canonG(g: org.apache.spark.sql.DataFrame) =
        g.select($"cluster".cast("long").as("c"), $"id", $"nbrs", $"nscores")
          .orderBy($"c", $"id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq,
            r.getSeq[Double](3).toSeq)).toSeq
      canonG(appended) shouldBe canonG(NswIndex.fitGraph(all, degree = 5))
      def canonE(g: org.apache.spark.sql.DataFrame) =
        g.select($"cluster".cast("long").as("c"), $"entry")
          .orderBy($"c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      canonE(appEntries) shouldBe canonE(NswIndex.entryPoints(all, cent))
      assertCleanAudit(
        graft.tools.StoreDoctor.auditNsw(spark, s"$dir/noflat", dir))
    }

    it("splitOversizedNswCells rebuilds split cells and keeps the rest verbatim") {
      // k=4 fit; force ONLY the largest cell over the cap, so the gate's
      // degenerate whole-corpus case (q188) is complemented by the merge
      // path: untouched cells' stored rows must survive BYTE-identical
      // while the split cell's sub-cells are rebuilt from the new layout
      val e = corpus
      val cent = IvfIndex.fitCentroids(spark, e, k = 4, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val sizes = indexed.groupBy($"cluster").count()
        .collect().map(r => (r.get(0).toString.toLong, r.getLong(1))).toMap
      val cap = sizes.values.toSeq.sorted.takeRight(2) match {
        case Seq(second, biggest) =>
          biggest should be > second; (biggest + second) / 2
        case _ => fail("need >= 2 cells")
      }
      val flat = java.nio.file.Files.createTempDirectory("graft-nswsp-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswsp-g").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 3),
        NswIndex.entryPoints(indexed, cent), nsw)
      NswIndex.splitOversizedNswCells(spark, flat, nsw,
        maxCellSize = cap, degree = 3) shouldBe 1
      val (cent2, idx2) = IvfIndex.load(spark, flat)
      val (graph2, entries2) = NswIndex.loadNsw(spark, nsw)
      val idx2n = idx2.select($"id", $"v", $"cluster".cast("long").as("cluster"))
      def canonG(g: org.apache.spark.sql.DataFrame) =
        g.select($"cluster".cast("long").as("c"), $"id", $"nbrs", $"nscores")
          .orderBy($"c", $"id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq,
            r.getSeq[Double](3).toSeq)).toSeq
      canonG(graph2) shouldBe canonG(NswIndex.fitGraph(idx2n, degree = 3))
      def canonE(g: org.apache.spark.sql.DataFrame) =
        g.select($"cluster".cast("long").as("c"), $"entry")
          .orderBy($"c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      canonE(entries2) shouldBe canonE(NswIndex.entryPoints(idx2n,
        cent2.select($"cluster".cast("long").as("cluster"), $"centroid")))
      // the post-split layout really has one more cell than the fit
      idx2.select($"cluster").distinct().count() shouldBe 5L
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flat, nsw))
    }

    it("filtered search: flat face is the exact filtered top-k; graph face never seats a non-matching row") {
      val (e, cent, indexed, queries) = fitted()
      val idxAttr = indexed.withColumn("even", $"id" % 2 === 0).localCheckpoint()
      // flat face, full probe width: must equal brute force over the
      // filtered corpus — the no-starvation contract made total
      val got = IvfIndex.searchFiltered(spark, queries, idxAttr, cent,
          k = 5, nProbe = 8, pred = $"even")
        .select($"q_id", $"rank", $"n_id").orderBy($"q_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      val truth = Similarity.bruteForceTopKAgg(spark, queries,
          e.filter($"id" % 2 === 0).select($"id".as("n_id"), $"v".as("cv")), 5)
        .select($"q_id", $"rank", $"n_id").orderBy($"q_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      got shouldBe truth
      // graph face: every returned row satisfies the predicate
      val graph = NswIndex.fitGraph(idxAttr, degree = 4).localCheckpoint()
      val entries = NswIndex.entryPoints(idxAttr, cent)
      val filtered = NswIndex.searchFiltered(spark, queries, graph, idxAttr,
        cent, entries, k = 5, nProbe = 2, ef = 16, rounds = 3, pred = $"even")
      filtered.filter($"n_id" % 2 =!= 0).count() shouldBe 0L
      filtered.groupBy($"q_id").count().collect()
        .foreach(_.getLong(1) should be <= 5L)
    }

    it("deleteFromNsw reproduces the rebuild-without-ids bit-for-bit") {
      val e = corpus
      val cent = IvfIndex.fitCentroids(spark, e, k = 4, iterations = 1,
        orderedMean = true).localCheckpoint()
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val flat = java.nio.file.Files.createTempDirectory("graft-nswdel-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswdel-g").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 3),
        NswIndex.entryPoints(indexed, cent), nsw)
      NswIndex.deleteFromNsw(spark, flat, nsw,
        e.filter($"id" % 3 === 1).select($"id"), degree = 3) should be >= 1
      val survivors = indexed.filter($"id" % 3 =!= 1)
        .select($"id", $"v", $"cluster".cast("long").as("cluster"))
      // the flat store lost exactly the deleted rows
      val (_, idx2) = IvfIndex.load(spark, flat)
      idx2.select($"id").orderBy($"id").collect().map(_.getLong(0)).toSeq shouldBe
        survivors.select($"id").orderBy($"id").collect().map(_.getLong(0)).toSeq
      // graph and entries equal the direct build over the survivors
      val (graph2, entries2) = NswIndex.loadNsw(spark, nsw)
      def canonG(g: org.apache.spark.sql.DataFrame) =
        g.select($"cluster".cast("long").as("c"), $"id", $"nbrs", $"nscores")
          .orderBy($"c", $"id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq,
            r.getSeq[Double](3).toSeq)).toSeq
      canonG(graph2) shouldBe canonG(NswIndex.fitGraph(survivors, degree = 3))
      def canonE(g: org.apache.spark.sql.DataFrame) =
        g.select($"cluster".cast("long").as("c"), $"entry")
          .orderBy($"c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      canonE(entries2) shouldBe canonE(NswIndex.entryPoints(survivors,
        cent.select($"cluster".cast("long").as("cluster"), $"centroid")))
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flat, nsw))
    }

    it("splitOversizedNswCells is a no-op when no cell exceeds the cap") {
      val e = corpus.filter($"id" < 60)
      val cent = IvfIndex.fitCentroids(spark, e, k = 4, iterations = 1,
        orderedMean = true)
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val flat = java.nio.file.Files.createTempDirectory("graft-nswnop-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswnop-g").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 3),
        NswIndex.entryPoints(indexed, cent), nsw)
      val genBefore = graft.sources.StoreFs.readManifest(s"$nsw/manifest")
      NswIndex.splitOversizedNswCells(spark, flat, nsw,
        maxCellSize = 1000L, degree = 3) shouldBe 0
      graft.sources.StoreFs.readManifest(s"$nsw/manifest") shouldBe genBefore
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flat, nsw))
    }

    it("tuneWalk chooses the cheapest setting meeting the floor and round-trips") {
      val (e, cent, indexed, _) = fitted()
      val flat = java.nio.file.Files.createTempDirectory("graft-nswtune-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswtune-g").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 4),
        NswIndex.entryPoints(indexed, cent), nsw)
      val sample = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      val settings = Seq((10, 1), (10, 2), (16, 2), (16, 3))
      // floor -> 0+: every setting qualifies, so the cheapest must win
      NswIndex.tuneWalk(spark, flat, nsw, sample, k = 10, nProbe = 2,
        settings, recallFloor = 1e-9) shouldBe ((10, 1))
      // floor 1.0 is unreachable at nProbe=2 here: the fallback must be
      // the highest-recall setting, and the persisted table round-trips
      val chosen = NswIndex.tuneWalk(spark, flat, nsw, sample, k = 10,
        nProbe = 2, settings, recallFloor = 1.0)
      val table = spark.read.parquet(s"$nsw/tuning")
      table.count() shouldBe 4L
      val best = table.orderBy($"avg_recall".desc, $"cost", $"ef", $"rounds")
        .select($"ef", $"rounds").head()
      chosen shouldBe ((best.getInt(0), best.getInt(1)))
      NswIndex.loadTunedWalk(spark, nsw) shouldBe chosen
      // recall is monotone in the beam budget on this fixture
      val byCost = table.orderBy($"cost").select($"avg_recall")
        .collect().map(_.getDouble(0)).toSeq
      byCost.sliding(2).foreach {
        case Seq(a, b) => b should be >= a
        case _ =>
      }
    }

    it("tuneWalkJoint discovers (nProbe, seeds) jointly and refresh rides the 4-dial point") {
      import NswIndex.WalkSetting
      val (e, cent, indexed, _) = fitted()
      val flat = java.nio.file.Files.createTempDirectory("graft-nswjt-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswjt-g").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 4),
        NswIndex.entryPoints(indexed, cent), nsw)
      val sample = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      val grid = Seq(WalkSetting(2, 10, 1, 1), WalkSetting(2, 10, 1, 4),
        WalkSetting(4, 10, 1, 1), WalkSetting(2, 16, 2, 1))
      // floor -> 0+: cheapest by the TRUE scored-vector budget
      // nProbe·seeds + rounds·ef·degree wins — the grid's costs are
      // (2,10,1,1)=42, (4,10,1,1)=44, (2,10,1,4)=48, (2,16,2,1)=130
      NswIndex.tuneWalkJoint(spark, flat, nsw, sample, k = 10, degree = 4,
        grid, recallFloor = 1e-9) shouldBe WalkSetting(2, 10, 1, 1)
      val table = spark.read.parquet(s"$nsw/tuning")
      table.count() shouldBe 4L
      table.filter($"n_probe" === 2 && $"ef" === 10 && $"rounds" === 1 &&
        $"seeds" === 1).select($"cost").head().getLong(0) shouldBe 42L
      // more seeds only ADD visited nodes (visited-set monotonicity),
      // so recall is monotone in seeds at a fixed (nProbe, ef, rounds)
      val rec1 = table.filter($"seeds" === 1 && $"n_probe" === 2 &&
        $"ef" === 10).select($"avg_recall").head().getDouble(0)
      val rec4 = table.filter($"seeds" === 4).select($"avg_recall")
        .head().getDouble(0)
      rec4 should be >= rec1
      // floor at the multi-seed row's measured recall: the tuner must
      // discover the cheapest row meeting it — replay the choice rule
      val chosen = NswIndex.tuneWalkJoint(spark, flat, nsw, sample, k = 10,
        degree = 4, grid, recallFloor = rec4)
      val rows = spark.read.parquet(s"$nsw/tuning")
        .select($"n_probe", $"ef", $"rounds", $"seeds", $"cost",
          $"avg_recall", $"chosen").collect()
      val expect = rows.filter(_.getDouble(5) >= rec4)
        .sortBy(r => (r.getLong(4), r.getInt(0), r.getInt(1), r.getInt(2),
          r.getInt(3))).head
      chosen shouldBe WalkSetting(expect.getInt(0), expect.getInt(1),
        expect.getInt(2), expect.getInt(3))
      rows.count(_.getBoolean(6)) shouldBe 1
      NswIndex.loadTunedWalkSetting(spark, nsw) shouldBe chosen
      // refresh measures AT the chosen 4-dial point (healthy: the same
      // corpus and sample cannot have gone stale) and keeps it
      val (ef1, r1, refreshed1) = NswIndex.refreshWalkTuning(spark, flat, nsw)
      (ef1, r1) shouldBe ((chosen.ef, chosen.rounds))
      refreshed1 shouldBe false
      NswIndex.loadTunedWalkSetting(spark, nsw) shouldBe chosen
      val check = spark.read.parquet(s"$nsw/tuning_check")
      check.count() shouldBe 1L
      check.select($"n_probe", $"seeds").head() match {
        case row => (row.getInt(0), row.getInt(1)) shouldBe
          ((chosen.nProbe, chosen.seeds))
      }
      // stale at an unreachable floor: the re-tune re-measures the
      // FULL joint grid (costs carried from the table, degree not
      // re-supplied) and falls back to the highest-recall setting
      NswIndex.tuneWalkJoint(spark, flat, nsw, sample, k = 10, degree = 4,
        grid, recallFloor = 1.0): Unit
      val (_, _, refreshed2) = NswIndex.refreshWalkTuning(spark, flat, nsw)
      refreshed2 shouldBe true
      spark.read.parquet(s"$nsw/tuning").count() shouldBe 4L
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flat, nsw))
    }

    it("refreshWalkTuning keeps a healthy point and re-tunes a stale one") {
      val (e, cent, indexed, _) = fitted()
      val flat = java.nio.file.Files.createTempDirectory("graft-nswref-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswref-g").toString
      IvfIndex.save(cent, indexed, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(indexed, degree = 4),
        NswIndex.entryPoints(indexed, cent), nsw)
      val sample = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      val settings = Seq((10, 1), (16, 3))
      // floor -> 0+: the cheap point wins AND can never go stale
      NswIndex.tuneWalk(spark, flat, nsw, sample, k = 10, nProbe = 2,
        settings, recallFloor = 1e-9) shouldBe ((10, 1))
      // healthy: same corpus, persisted sample — nothing to refresh
      val (ef1, r1, refreshed1) = NswIndex.refreshWalkTuning(spark, flat, nsw)
      (ef1, r1, refreshed1) shouldBe ((10, 1, false))
      NswIndex.loadTunedWalk(spark, nsw) shouldBe ((10, 1))
      // the check audit row landed, marked not-stale
      val audit = spark.read.parquet(s"$nsw/tuning_check")
      audit.count() shouldBe 1L
      audit.select($"stale").head().getBoolean(0) shouldBe false
      // force staleness: re-tune at an unreachable floor tracked by the
      // persisted table (1.0), so the refresh must find the stored
      // point below it and re-choose (fallback = highest recall)
      NswIndex.tuneWalk(spark, flat, nsw, sample, k = 10, nProbe = 2,
        settings, recallFloor = 1.0): Unit
      val (_, _, refreshed2) = NswIndex.refreshWalkTuning(spark, flat, nsw)
      refreshed2 shouldBe true
      spark.read.parquet(s"$nsw/tuning_check").count() shouldBe 2L
      // the refreshed table is a full re-measure of the same grid
      spark.read.parquet(s"$nsw/tuning").count() shouldBe 2L
      // a store tuned before the sample-persisting tuneWalk (no
      // tuning_sample) fails with the remedy, not a raw path-not-found
      graft.sources.StoreFs.deleteChild(nsw, "tuning_sample")
      val ex = the[IllegalArgumentException] thrownBy
        NswIndex.refreshWalkTuning(spark, flat, nsw)
      ex.getMessage should include("tuning_sample")
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flat, nsw))
    }

    it("appendToNswRefreshing re-checks the operating point after the append") {
      val (e, cent, _, _) = fitted()
      val base = e.filter($"id" % 10 < 9)
      val delta = e.filter($"id" % 10 === 9)
      val idxBase = IvfIndex.assign(base, cent).localCheckpoint()
      val idxDelta = IvfIndex.assign(delta, cent).localCheckpoint()
      val flat = java.nio.file.Files.createTempDirectory("graft-nswar-f").toString
      val nsw = java.nio.file.Files.createTempDirectory("graft-nswar-g").toString
      IvfIndex.save(cent, idxBase, flat)
      NswIndex.saveNsw(NswIndex.fitGraph(idxBase, degree = 4),
        NswIndex.entryPoints(idxBase, cent), nsw)
      val sample = base.filter($"id" < 10)
        .select($"id".as("q_id"), $"v".as("qv"))
      NswIndex.tuneWalk(spark, flat, nsw, sample, k = 10, nProbe = 2,
        Seq((10, 1), (16, 3)), recallFloor = 1e-9): Unit
      // append with the refreshing face: flat tier first (the tuning
      // measures against it), then the graph append + staleness check
      IvfIndex.assign(delta, cent).write.mode("append")
        .partitionBy("cluster").parquet(s"$flat/index")
      spark.catalog.refreshByPath(s"$flat/index")
      NswIndex.appendToNswRefreshing(spark, flat, nsw, idxBase, idxDelta,
        cent, degree = 4)
      // the lifecycle verb left a check-audit row behind
      spark.read.parquet(s"$nsw/tuning_check").count() shouldBe 1L
      NswIndex.loadTunedWalk(spark, nsw)._1 should be >= 10
      assertCleanAudit(graft.tools.StoreDoctor.auditNsw(spark, flat, nsw))
    }

    it("recall >= the IVF+PQ-ADC tier at equal probe budget") {
      val (e, cent, indexed, queries) = fitted()
      val truth = Similarity.bruteForceTopKAgg(spark, queries,
          e.select($"id".as("n_id"), $"v".as("cv")), 10)
        .select($"q_id", $"n_id").localCheckpoint()
      def recall(result: org.apache.spark.sql.DataFrame): Double = {
        val hits = result.select($"q_id", $"n_id")
          .join(truth, Seq("q_id", "n_id"), "left_semi").count()
        hits.toDouble / truth.count()
      }
      val graph = NswIndex.fitGraph(indexed, degree = 8).localCheckpoint()
      val entries = NswIndex.entryPoints(indexed, cent)
      val nsw = NswIndex.search(spark, queries, graph, indexed, cent, entries,
        k = 10, nProbe = 2, ef = 32, rounds = 3)
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codes = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val adc = PqIndex.ivfAdcSearch(spark, queries, codes,
        indexed.select($"cluster", $"id", $"v"), cent, cb,
        m = 4, subDim = 16, k = 10, rerank = 10, nProbe = 2)
      val (rNsw, rAdc) = (recall(nsw), recall(adc))
      withClue(s"nsw recall $rNsw vs adc recall $rAdc: ") {
        rNsw should be >= rAdc
      }
      info(f"recall@10 nProbe=2: nsw=$rNsw%.3f adc=$rAdc%.3f")
    }
  }
}
