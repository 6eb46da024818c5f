package graft

import org.apache.spark.sql.functions._
import graft.operators.PqIndex

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))

  describe("PqIndex") {
    it("fitCodebooks yields dense contiguous codes per subspace") {
      val cb = PqIndex.fitCodebooks(spark, corpus, m = 4, ks = 8, iterations = 1)
      val bySub = cb.groupBy($"sub")
        .agg(collect_list($"code").as("codes"), count(lit(1)).as("n"))
        .collect()
      bySub.length shouldBe 4
      bySub.foreach { r =>
        val codes = r.getSeq[Int](1).sorted
        codes shouldBe (0 until r.getLong(2).toInt)
      }
    }

    it("encode is partitioning-independent") {
      val cb = PqIndex.fitCodebooks(spark, corpus, m = 4, ks = 8, iterations = 1)
      val a = PqIndex.encode(corpus.repartition(1), cb, m = 4, subDim = 16)
        .orderBy($"id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      val b = PqIndex.encode(corpus.repartition(13), cb, m = 4, subDim = 16)
        .orderBy($"id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      a shouldBe b
    }

    it("ADC distance equals the distance to the PQ reconstruction") {
      val cb = PqIndex.fitCodebooks(spark, corpus, m = 4, ks = 8, iterations = 1)
        .localCheckpoint()
      val codes = PqIndex.encode(corpus, cb, m = 4, subDim = 16)
      val queries = corpus.filter($"id" < 3).select($"id".as("q_id"), $"v".as("qv"))
      val adc = PqIndex.adcSearch(spark, queries, codes, cb,
        m = 4, subDim = 16, k = 500)
      // reconstruction: concat the per-subspace codewords in sub order
      val recon = codes.select($"id", posexplode($"codes").as(Seq("sub", "code")))
        .join(cb, Seq("sub", "code"))
        .groupBy($"id")
        .agg(array_sort(collect_list(struct($"sub", $"centroid"))).as("p"))
        .select($"id".as("n_id"), flatten(expr("transform(p, x -> x.centroid)")).as("rv"))
      val direct = queries.crossJoin(recon)
        .select($"q_id", $"n_id",
          (round(PqIndex.l2Sq($"qv", $"rv"), 4) + 0.0).as("want"))
      val joined = adc.join(direct, Seq("q_id", "n_id"))
      joined.count() shouldBe adc.count()
      joined.filter(abs($"ad2" - $"want") > 1e-6).count() shouldBe 0
    }

    it("a corpus lying exactly on its codewords self-retrieves at distance 0") {
      // 8 distinct prototype vectors replicated — quantization is lossless
      val protos = (0 until 8).map(p =>
        (p.toLong, (0 until 32).map(d => (p * 31 + d * 7 % 13).toDouble)))
      val df = (0 until 32).map(i => (i.toLong, protos(i % 8)._2)).toDF("id", "v")
      val cb = PqIndex.fitCodebooks(spark, df, m = 2, ks = 8, iterations = 2)
      val codes = PqIndex.encode(df, cb, m = 2, subDim = 16)
      val queries = df.filter($"id" < 8).select($"id".as("q_id"), $"v".as("qv"))
      val top1 = PqIndex.adcSearch(spark, queries, codes, cb,
          m = 2, subDim = 16, k = 1)
      top1.filter($"ad2" =!= 0.0).count() shouldBe 0
    }

    it("ivfAdcSearch with full probe width and corpus-wide rerank equals exact L2 top-k") {
      val e = corpus.localCheckpoint()
      val n = e.count().toInt
      val cent = graft.operators.IvfIndex.fitCentroids(spark, e, k = 4,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(e, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 8, iterations = 1)
      val codesIdx = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val fullIdx = indexed.select($"cluster", $"id", $"v")
      val queries = e.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      val got = PqIndex.ivfAdcSearch(spark, queries, codesIdx, fullIdx, cent,
          cb, m = 4, subDim = 16, k = 5, rerank = n, nProbe = 4)
        .select($"q_id", $"rank", $"n_id")
      // exact L2 truth via a ranking window over all pairs
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"d2".asc, $"n_id".asc)
      val truth = queries.crossJoin(e.select($"id".as("n_id"), $"v".as("cv")))
        .select($"q_id", $"n_id", PqIndex.l2Sq($"qv", $"cv").as("d2"))
        .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
        .select($"q_id", $"rank", $"n_id")
      got.exceptAll(truth).count() shouldBe 0
      truth.exceptAll(got).count() shouldBe 0
    }

    it("deleteFromTwoTier tombstones equal a rebuild without the ids; compaction is invisible") {
      val e = corpus.localCheckpoint()
      val cent = graft.operators.IvfIndex.fitCentroids(spark, e, k = 4,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(e, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 8, iterations = 1)
      val codesIdx = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val fullIdx = indexed.select($"cluster", $"id", $"v")
      val queries = e.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      val dir = java.nio.file.Files.createTempDirectory("graft-pq-del").toString
      PqIndex.saveTwoTier(cent, cb, codesIdx, fullIdx, dir)
      PqIndex.deleteFromTwoTier(spark, dir,
        e.filter($"id" % 3 === 1).select($"id"))
      def run(codes: org.apache.spark.sql.DataFrame,
              full: org.apache.spark.sql.DataFrame,
              c: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
        PqIndex.ivfAdcSearch(spark, queries, codes, full, c, b,
            m = 4, subDim = 16, k = 5, rerank = 10, nProbe = 2)
          .orderBy($"q_id", $"rank").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      // rebuild-without-ids ground truth: same fit params, filtered tiers
      val want = run(codesIdx.filter($"id" % 3 =!= 1),
        fullIdx.filter($"id" % 3 =!= 1), cent, cb)
      // tombstone read path (pre-compaction)
      val (c1, b1, k1, f1) = PqIndex.loadTwoTier(spark, dir)
      run(k1, f1, c1, b1) shouldBe want
      // compaction folds the tombstones in and must be invisible
      PqIndex.compactTwoTier(spark, dir)
      graft.sources.StoreFs.childNames(dir) should not contain "tombstones"
      val (c2, b2, k2, f2) = PqIndex.loadTwoTier(spark, dir)
      run(k2, f2, c2, b2) shouldBe want
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("residual ivfAdcSearch with full probe width and corpus-wide rerank equals exact L2 top-k") {
      val e = corpus.localCheckpoint()
      val n = e.count().toInt
      val cent = graft.operators.IvfIndex.fitCentroids(spark, e, k = 4,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(e, cent).localCheckpoint()
      val resid = PqIndex.residuals(indexed, cent)
      val cb = PqIndex.fitCodebooks(spark, resid.select($"id", $"v"),
        m = 4, ks = 8, iterations = 1)
      val codesIdx = PqIndex.encode(resid.select($"id", $"v"), cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val fullIdx = indexed.select($"cluster", $"id", $"v")
      val queries = e.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      val got = PqIndex.ivfAdcSearch(spark, queries, codesIdx, fullIdx, cent,
          cb, m = 4, subDim = 16, k = 5, rerank = n, nProbe = 4, residual = true)
        .select($"q_id", $"rank", $"n_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"d2".asc, $"n_id".asc)
      val truth = queries.crossJoin(e.select($"id".as("n_id"), $"v".as("cv")))
        .select($"q_id", $"n_id", PqIndex.l2Sq($"qv", $"cv").as("d2"))
        .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
        .select($"q_id", $"rank", $"n_id")
      got.exceptAll(truth).count() shouldBe 0
      truth.exceptAll(got).count() shouldBe 0
    }

    it("residual coding beats raw-vector coding on a clustered corpus") {
      // 4 tight clusters: vectors = big prototype + small offset, ids
      // arranged so the first 4 (the coarse seeds) cover all protos
      val dim = 32
      val df = (0 until 64).map { i =>
        val proto = i % 4
        val v = (0 until dim).map(d =>
          proto * 50.0 * math.sin(d + proto) + ((i / 4 + d) % 7) * 0.5)
        (i.toLong, v)
      }.toDF("id", "v").localCheckpoint()
      val cent = graft.operators.IvfIndex.fitCentroids(spark, df, k = 4,
        iterations = 2, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(df, cent).localCheckpoint()
      val queries = df.filter($"id" < 8).select($"id".as("q_id"), $"v".as("qv"))
      val fullIdx = indexed.select($"cluster", $"id", $"v")
      def meanErr(residual: Boolean): Double = {
        val src = if (residual) PqIndex.residuals(indexed, cent)
          .select($"id", $"v") else df
        val cb = PqIndex.fitCodebooks(spark, src, m = 2, ks = 4, iterations = 1)
        val codesIdx = PqIndex.encode(src, cb, m = 2, subDim = 16)
          .join(indexed.select($"id", $"cluster"), Seq("id"))
          .select($"cluster", $"id", $"codes")
        PqIndex.ivfAdcSearch(spark, queries, codesIdx, fullIdx, cent, cb,
            m = 2, subDim = 16, k = 8, rerank = 64, nProbe = 4,
            residual = residual)
          .select(avg(abs($"ad2" - $"d2"))).head().getDouble(0)
      }
      val (rawErr, resErr) = (meanErr(residual = false), meanErr(residual = true))
      withClue(s"raw=$rawErr residual=$resErr: ") {
        resErr should be < rawErr * 0.5
      }
    }

    it("meanQuantError is zero for a corpus lying exactly on its codewords") {
      val protos = (0 until 8).map(p =>
        (p.toLong, (0 until 32).map(d => (p * 31 + d * 7 % 13).toDouble)))
      val df = (0 until 32).map(i => (i.toLong, protos(i % 8)._2)).toDF("id", "v")
      val cent = graft.operators.IvfIndex.fitCentroids(spark, df, k = 2,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(df, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, df, m = 2, ks = 8, iterations = 2)
      val r = PqIndex.meanQuantError(spark,
        indexed.select($"cluster", $"id", $"v"), cent, cb,
        m = 2, subDim = 16).head()
      r.getAs[Double]("mean_qerr") shouldBe 0.0
      r.getAs[Long]("n_rows") shouldBe 32L
    }

    it("tuneTwoTierNProbe + refreshTwoTierTuning: healthy point kept, stale point re-tuned, codebook drift flagged") {
      val e = corpus.localCheckpoint()
      val cent = graft.operators.IvfIndex.fitCentroids(spark, e, k = 8,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(e, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codesIdx = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val dir = java.nio.file.Files.createTempDirectory("graft-pq-ref").toString
      PqIndex.saveTwoTier(cent, cb, codesIdx,
        indexed.select($"cluster", $"id", $"v"), dir)
      val queries = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      // floor -> 0+: width 1 wins and cannot go stale on the same corpus
      PqIndex.tuneTwoTierNProbe(spark, dir, queries, k = 5, rerank = 40,
        nProbes = Seq(1, 2, 4), recallFloor = 1e-9,
        m = 4, subDim = 16) shouldBe 1
      PqIndex.loadTunedTwoTier(spark, dir)._1 shouldBe 1
      val qerrFit = spark.read.parquet(s"$dir/codebook_fit")
        .select($"mean_qerr").head().getDouble(0)
      val (w1, retuned1, refit1) = PqIndex.refreshTwoTierTuning(spark, dir)
      (w1, retuned1, refit1) shouldBe ((1, false, false))
      val audit1 = spark.read.parquet(s"$dir/tuning_check").collect()
      audit1.length shouldBe 1
      audit1.head.getAs[Boolean]("stale") shouldBe false
      audit1.head.getAs[Boolean]("refit_recommended") shouldBe false
      // no drift yet: the live-store error equals the fit baseline
      audit1.head.getAs[Double]("mean_qerr") shouldBe qerrFit
      // drift: pin the floor to width 1's own measured recall, append
      // shifted twins of the whole corpus, refresh against the drifted
      // workload — and whatever the staleness verdict, the codebook
      // baseline must NOT move (it belongs to the FIT, not the tune)
      val r1 = spark.read.parquet(s"$dir/tuning")
        .filter($"n_probe" === 1).select($"avg_recall").head().getDouble(0)
      PqIndex.tuneTwoTierNProbe(spark, dir, queries, k = 5, rerank = 40,
        nProbes = Seq(1, 2, 4), recallFloor = r1, m = 4, subDim = 16) shouldBe 1
      val delta = e.select(($"id" + 100000).as("id"),
        transform($"v", x => x + lit(0.1)).as("v"))
      PqIndex.appendToTwoTier(spark, delta, dir, m = 4, subDim = 16): Unit
      val driftQ = delta.filter($"id" < 100010)
        .select($"id".as("q_id"), $"v".as("qv"))
      val (w2, retuned2, refit2) =
        PqIndex.refreshTwoTierTuning(spark, dir, Some(driftQ))
      val audit2 = spark.read.parquet(s"$dir/tuning_check").collect()
      audit2.length shouldBe 2
      retuned2 shouldBe audit2.map(_.getAs[Boolean]("stale")).contains(true)
      if (retuned2) PqIndex.loadTunedTwoTier(spark, dir)._1 shouldBe w2
      // the shifted twins reconstruct strictly worse under the
      // base-fitted codebooks: the refit recommendation must fire
      refit2 shouldBe true
      spark.read.parquet(s"$dir/codebook_fit")
        .select($"mean_qerr").head().getDouble(0) shouldBe qerrFit
      // pre-sample-persisting stores fail with the remedy, not a raw
      // path-not-found
      graft.sources.StoreFs.deleteChild(dir, "tuning_sample")
      val ex = the[IllegalArgumentException] thrownBy
        PqIndex.refreshTwoTierTuning(spark, dir)
      ex.getMessage should include("tuning_sample")
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("appendToTwoTierRefreshing re-checks the operating point and codebook fit after the append") {
      val e = corpus.localCheckpoint()
      val base = e.filter($"id" % 10 < 9)
      val delta = e.filter($"id" % 10 === 9)
      val cent = graft.operators.IvfIndex.fitCentroids(spark, base, k = 4,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(base, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, base, m = 4, ks = 16, iterations = 1)
      val codesIdx = PqIndex.encode(base, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val dir = java.nio.file.Files.createTempDirectory("graft-pq-apr").toString
      PqIndex.saveTwoTier(cent, cb, codesIdx,
        indexed.select($"cluster", $"id", $"v"), dir)
      // no tuning table yet: the refreshing face appends without a check
      PqIndex.appendToTwoTierRefreshing(spark, delta, dir,
        m = 4, subDim = 16): Unit
      graft.sources.StoreFs
        .childNames(dir) should not contain "tuning_check"
      PqIndex.compactTwoTier(spark, dir) // no-op (no tombstones); keep state
      val queries = base.filter($"id" < 10)
        .select($"id".as("q_id"), $"v".as("qv"))
      PqIndex.tuneTwoTierNProbe(spark, dir, queries, k = 5, rerank = 40,
        nProbes = Seq(1, 2, 4), recallFloor = 1e-9, m = 4, subDim = 16): Unit
      // tuned store: the next refreshing append leaves a check-audit row
      val more = e.select(($"id" + 200000).as("id"),
        transform($"v", x => x + lit(0.05)).as("v"))
      PqIndex.appendToTwoTierRefreshing(spark, more, dir,
        m = 4, subDim = 16): Unit
      val checks = spark.read.parquet(s"$dir/tuning_check")
      checks.count() shouldBe 1L
      // the audit row carries both drift surfaces: recall at the
      // stored point AND quantization error vs the fit baseline
      val row = checks.head()
      row.getAs[Double]("mean_qerr") should be > 0.0
      row.getAs[Double]("fit_qerr") should be > 0.0
      PqIndex.loadTunedTwoTier(spark, dir)._1 should be >= 1
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("refitTwoTier folds tombstones, resets the drift baseline, and clears the refit recommendation") {
      val e = corpus.localCheckpoint()
      val cent = graft.operators.IvfIndex.fitCentroids(spark, e, k = 8,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(e, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codesIdx = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val dir = java.nio.file.Files.createTempDirectory("graft-pq-refit").toString
      PqIndex.saveTwoTier(cent, cb, codesIdx,
        indexed.select($"cluster", $"id", $"v"), dir)
      val queries = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      PqIndex.tuneTwoTierNProbe(spark, dir, queries, k = 5, rerank = 40,
        nProbes = Seq(1, 2, 4), recallFloor = 0.8, m = 4, subDim = 16): Unit
      // drift the store: shifted twins appended, some base rows deleted
      val delta = e.select(($"id" + 100000).as("id"),
        transform($"v", x => x + lit(0.1)).as("v"))
      PqIndex.appendToTwoTier(spark, delta, dir, m = 4, subDim = 16): Unit
      PqIndex.deleteFromTwoTier(spark, dir,
        e.filter($"id" % 7 === 0).select($"id"))
      val (_, _, refitRec) =
        PqIndex.refreshTwoTierTuning(spark, dir,
          Some(delta.filter($"id" < 100010)
            .select($"id".as("q_id"), $"v".as("qv"))))
      refitRec shouldBe true // the drifted store earns the recommendation
      val preQerr = spark.read.parquet(s"$dir/tuning_check")
        .orderBy($"mean_qerr".desc).select($"mean_qerr").head().getDouble(0)
      // THE REMEDY
      PqIndex.refitTwoTier(spark, dir, m = 4, subDim = 16, ks = 16,
        iterations = 1)
      // tombstones folded: the new generation holds live rows only
      graft.sources.StoreFs.childNames(dir) should not contain "tombstones"
      val (_, _, _, full2) = PqIndex.loadTwoTier(spark, dir)
      full2.filter($"id" % 7 === 0 && $"id" < 100000).count() shouldBe 0
      // baseline reset to the FRESH fit, strictly better than the
      // drifted pre-refit error over the same live rows
      val newBaseline = spark.read.parquet(s"$dir/codebook_fit")
        .select($"mean_qerr").head().getDouble(0)
      newBaseline should be < preQerr
      // and the recommendation clears: live error == baseline now
      val (_, _, refitRec2) = PqIndex.refreshTwoTierTuning(spark, dir)
      refitRec2 shouldBe false
      // provenance guard: a refit at the wrong shape must refuse
      val genBefore = graft.sources.StoreFs.readManifest(s"$dir/manifest").get
      val ex = the[IllegalArgumentException] thrownBy
        PqIndex.refitTwoTier(spark, dir, m = 2, subDim = 32, ks = 16,
          iterations = 1)
      ex.getMessage should include("persisted tuning")
      // ...and refuses BEFORE mutating: no new generation committed
      graft.sources.StoreFs.readManifest(s"$dir/manifest").get shouldBe genBefore
      // regime mismatch (raw-tuned store, residual refit) refuses too
      val exR = the[IllegalArgumentException] thrownBy
        PqIndex.refitTwoTier(spark, dir, m = 4, subDim = 16, ks = 16,
          iterations = 1, residual = true)
      exR.getMessage should include("persisted tuning")
      graft.sources.StoreFs.readManifest(s"$dir/manifest").get shouldBe genBefore
      // appendToTwoTierRefreshing carries the SAME pre-mutation guard
      // (r14 ADVICE): a shape- or regime-mismatched call must refuse
      // BEFORE the non-idempotent append — otherwise the delta is
      // encoded in the wrong space and appended silently
      val fullBefore = PqIndex.loadTwoTier(spark, dir)._4.count()
      val delta2 = e.select(($"id" + 200000).as("id"), $"v")
      val exA = the[IllegalArgumentException] thrownBy
        PqIndex.appendToTwoTierRefreshing(spark, delta2, dir,
          m = 2, subDim = 32)
      exA.getMessage should include("persisted tuning")
      val exA2 = the[IllegalArgumentException] thrownBy
        PqIndex.appendToTwoTierRefreshing(spark, delta2, dir,
          m = 4, subDim = 16, residual = true)
      exA2.getMessage should include("persisted tuning")
      PqIndex.loadTwoTier(spark, dir)._4.count() shouldBe fullBefore
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("pre-sample stores: refreshing verbs refuse with the remedy BEFORE mutating") {
      val e = corpus.localCheckpoint()
      val cent = graft.operators.IvfIndex.fitCentroids(spark, e, k = 8,
        iterations = 1, orderedMean = true).localCheckpoint()
      val indexed = graft.operators.IvfIndex.assign(e, cent).localCheckpoint()
      val cb = PqIndex.fitCodebooks(spark, e, m = 4, ks = 16, iterations = 1)
      val codesIdx = PqIndex.encode(e, cb, m = 4, subDim = 16)
        .join(indexed.select($"id", $"cluster"), Seq("id"))
        .select($"cluster", $"id", $"codes")
      val dir = java.nio.file.Files.createTempDirectory("graft-pq-presample").toString
      PqIndex.saveTwoTier(cent, cb, codesIdx,
        indexed.select($"cluster", $"id", $"v"), dir)
      val queries = e.filter($"id" < 10).select($"id".as("q_id"), $"v".as("qv"))
      PqIndex.tuneTwoTierNProbe(spark, dir, queries, k = 5, rerank = 40,
        nProbes = Seq(1, 2, 4), recallFloor = 0.5, m = 4, subDim = 16): Unit
      // simulate a store tuned before tuneTwoTierNProbe persisted its sample
      graft.sources.StoreFs.deleteChild(dir, "tuning_sample")
      val genBefore = graft.sources.StoreFs.readManifest(s"$dir/manifest").get
      val fullBefore = PqIndex.loadTwoTier(spark, dir)._4.count()
      val delta = e.select(($"id" + 100000).as("id"), $"v")
      // appendToTwoTierRefreshing must refuse BEFORE the append lands —
      // the append is not idempotent, so a post-append failure invites
      // a retry that double-appends the delta
      val ex1 = the[IllegalArgumentException] thrownBy
        PqIndex.appendToTwoTierRefreshing(spark, delta, dir, m = 4, subDim = 16)
      ex1.getMessage should include("tuning_sample")
      PqIndex.loadTwoTier(spark, dir)._4.count() shouldBe fullBefore
      // refitTwoTier on the same pre-sample store: same remedy, and no
      // generation was committed before the refusal
      val ex2 = the[IllegalArgumentException] thrownBy
        PqIndex.refitTwoTier(spark, dir, m = 4, subDim = 16, ks = 16,
          iterations = 1)
      ex2.getMessage should include("tuning_sample")
      graft.sources.StoreFs.readManifest(s"$dir/manifest").get shouldBe genBefore
      assertCleanAudit(graft.tools.StoreDoctor.auditTwoTier(spark, dir))
    }

    it("rejects dimensions not divisible by m") {
      val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
      an[IllegalArgumentException] should be thrownBy
        PqIndex.fitCodebooks(spark, df, m = 2, ks = 2, iterations = 0)
    }
  }
}
