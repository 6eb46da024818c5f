package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  describe("BpeTrain.learnMerges") {
    it("reproduces the textbook BPE trajectory with lexicographic tie-break") {
      // the classic low/lower/newest/widest corpus (Sennrich et al.),
      // frequencies planted by word repetition
      val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
        .toDF("word", "freq")
      val out = graft.operators.BpeTrain.learnMerges(spark, words, merges = 4)
      // es and st both count 9 → 'e'<'s' wins; then est; lo/ow tie at 7
      out shouldBe Seq(
        (1, "e", "s", 9L), (2, "es", "t", 9L),
        (3, "l", "o", 7L), (4, "lo", "w", 7L))
    }

    it("merges greedily left-to-right without overlap") {
      val words = Seq(("aaa", 1L)).toDF("word", "freq")
      val out = graft.operators.BpeTrain.learnMerges(spark, words, merges = 2)
      // "a a a" → merge (a,a) once (non-overlap) → [aa, a]; next best
      // pair is then (aa, a)
      out shouldBe Seq((1, "a", "a", 2L), (2, "aa", "a", 1L))
    }

    it("batched learning skips conflicting pairs and recovers them next round") {
      // (a,a)=10 wins round 1 slot 1 and blocks {a, aa}; (a,b)=9
      // conflicts on 'a' and must be SKIPPED for (c,d)=8; round 2
      // recounts and (a,b) — untouched by the disjoint merges — wins
      val words = Seq(("aa", 10L), ("ab", 9L), ("cd", 8L), ("ef", 7L))
        .toDF("word", "freq")
      val out = graft.operators.BpeTrain
        .learnMergesBatched(spark, words, merges = 4, batch = 2)
      out shouldBe Seq(
        (1, "a", "a", 10L), (2, "c", "d", 8L),
        (3, "a", "b", 9L), (4, "e", "f", 7L))
      // sequential on the same table takes them in plain rank order —
      // the documented divergence the conflict guard exists to avoid
      graft.operators.BpeTrain.learnMerges(spark, words, merges = 4) shouldBe
        Seq((1, "a", "a", 10L), (2, "a", "b", 9L),
          (3, "c", "d", 8L), (4, "e", "f", 7L))
    }

    it("falls back to filtered re-queries when the collected prefix is all-conflicting") {
      // batch=2 collects a top-8 prefix; rows 2..8 all touch the first
      // accept's {a, b, ab}, so the second accept — the 9th-ranked
      // (c,d) — is only reachable through the fallback re-query path,
      // which must produce the same trajectory the old per-accept loop
      // did
      val words = Seq(
        ("ab", 100L), ("ac", 95L), ("ad", 94L), ("ae", 93L), ("af", 92L),
        ("ag", 91L), ("bc", 90L), ("bd", 89L), ("cd", 10L))
        .toDF("word", "freq")
      val out = graft.operators.BpeTrain
        .learnMergesBatched(spark, words, merges = 2, batch = 2)
      out shouldBe Seq((1, "a", "b", 100L), (2, "c", "d", 10L))
    }

    it("batch=1 is exactly the sequential trajectory; batching cuts job count") {
      val freqs = graft.operators.BpeTrain.wordFreqs(
        Tables.documents(spark, "/root/testdata/sf0.001").limit(100), "text")
        .localCheckpoint()
      val sc = spark.sparkContext
      def jobsOf(group: String)(f: => Unit): Int = {
        sc.setJobGroup(group, "bpe job probe", interruptOnCancel = false)
        try f finally sc.clearJobGroup()
        sc.statusTracker.getJobIdsForGroup(group).length
      }
      var seqT: Seq[(Int, String, String, Long)] = null
      var batT: Seq[(Int, String, String, Long)] = null
      val seqJobs = jobsOf("bpe-probe-seq") {
        seqT = graft.operators.BpeTrain.learnMerges(spark, freqs, merges = 8)
      }
      val batJobs = jobsOf("bpe-probe-bat") {
        batT = graft.operators.BpeTrain
          .learnMergesBatched(spark, freqs, merges = 8, batch = 4)
      }
      seqT should have size 8
      batT should have size 8
      // the HEAVY work (count-scan + fold checkpoint) runs once per
      // round: 8 rounds sequentially vs 2 batched — total job count
      // must drop even counting the tiny per-accept selection jobs
      batJobs should be < seqJobs
    }

    it("encode applies learned merges in order and compresses") {
      val docs2 = Seq((1L, "newest widest"), (2L, "low lower"))
        .toDF("doc_id", "text")
      // merges in the textbook order: es, est
      val row = graft.operators.BpeTrain
        .encode(docs2, Seq("doc_id"), "text", Seq(("e", "s"), ("es", "t")))
        .orderBy($"doc_id").collect()
      // newest → n,e,w,est (4); widest → w,i,d,est (4)
      row(0).getAs[Int]("n_words") shouldBe 2
      row(0).getAs[Long]("n_subwords") shouldBe 8L
      // low/lower untouched by these merges: 3 + 5 chars
      row(1).getAs[Long]("n_subwords") shouldBe 8L
      // merge ORDER matters: (es,t) before (e,s) can never fire "est"
      graft.operators.BpeTrain
        .encode(docs2, Seq("doc_id"), "text", Seq(("es", "t"), ("e", "s")))
        .orderBy($"doc_id").collect()(0)
        .getAs[Long]("n_subwords") shouldBe 10L // only es merges, not est
      // scale shape: the encoder is a pure per-row projection chain —
      // zero exchanges, tokenizing a corpus is exactly one scan
      val plan = graft.operators.BpeTrain
        .encode(docs2, Seq("doc_id"), "text", Seq(("e", "s")))
        .queryExecution.executedPlan.toString
      (plan should not).include("Exchange")
    }

    it("native subwordCount kernel equals the fold chain on a real corpus") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val merges = graft.operators.BpeTrain.learnMerges(spark,
        graft.operators.BpeTrain.wordFreqs(docs, "text"), merges = 6)
        .map { case (_, l, r, _) => (l, r) }
      val hof = graft.operators.BpeTrain
        .encode(docs, Seq("doc_id"), "text", merges)
        .select($"doc_id", $"n_subwords")
      val native = docs.select($"doc_id",
        graft.operators.BpeTrain.subwordCount($"text", merges).as("n_subwords"))
      native.exceptAll(hof).count() shouldBe 0L
      hof.exceptAll(native).count() shouldBe 0L
      // the kernel is a single codegen'd expression, no lambda frames
      val plan = native.queryExecution.executedPlan.toString
      plan should include("bpe_subword_count")
      (plan should not).include("lambda")
    }
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "THE quick   brown fox jumps over the lazy dog tonight"), // exact dup of 1 after norm
    (3L, "the quick brown fox jumps over the lazy dog yesterday"), // near dup of 1
    (4L, "completely different words about spark query engines here now")
  ).toDF("doc_id", "text")

  describe("TextDedup.exactDedup") {
    it("collapses normalization-equal texts to the smallest id") {
      val out = TextDedup.exactDedup(docs, "doc_id", "text")
      out.count() shouldBe 3
      val g = out.filter($"n_copies" === 2).head()
      g.getAs[Long]("keep_id") shouldBe 1L
    }
  }

  describe("TextDedup.jaccardPairs") {
    it("computes exact shingle jaccard for overlapping docs") {
      val sh = TextDedup.shingleTable(docs, "doc_id", "text", 3)
      val pairs = TextDedup.jaccardPairs(sh, 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // docs 1/2 identical after norm → jaccard 1.0
      pairs should contain((1L, 2L, 1.0))
      // docs 1/3 share 7 of 8 3-shingles positions minus last → 7/9
      assert(pairs.exists { case (a, b, j) => a == 1L && b == 3L && j > 0.7 && j < 0.8 })
      // doc 4 pairs with nothing
      pairs.exists { case (a, b, _) => a == 4L || b == 4L } shouldBe false
    }

    it("drops boilerplate shingles above the frequency cap") {
      val sh = TextDedup.shingleTable(docs, "doc_id", "text", 3)
      // cap=1: every shared shingle is dropped → no pairs survive
      TextDedup.jaccardPairs(sh, 0.01, maxShingleDf = Some(1)).count() shouldBe 0
    }
  }

  describe("TextDedup.minHashLshPairs") {
    it("finds the planted near-dup pair via banding + verification") {
      val sh = TextDedup.shingleTable(docs, "doc_id", "text", 3)
      val found = TextDedup.minHashLshPairs(sh, k = 8, rowsPerBand = 2, threshold = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      found should contain((1L, 2L)) // identical → all bands agree
    }

    it("maxBandDf bounds candidates on a degenerate hot-bucket corpus") {
      // 40 identical docs: every band key has df=40, so the uncapped
      // candidate join explodes to C(40,2) = 780 pairs PER BAND side
      val hot = (1L to 40L).map(i => (i, "same boilerplate text repeated " +
        "in every single crawled document body here")).toDF("doc_id", "text")
      val sh = TextDedup.shingleTable(hot, "doc_id", "text", 3)
      val sig = TextDedup.minHashSignature(sh, 8)
      TextDedup.lshCandidatePairs(sig, 8, 2).count() shouldBe 780
      // cap below the hot df → the degenerate bucket is dropped entirely
      TextDedup.lshCandidatePairs(sig, 8, 2, maxBandDf = Some(10))
        .count() shouldBe 0
    }

    it("maxBandDf above every band's df is a result no-op on normal data") {
      val sh = TextDedup.shingleTable(docs, "doc_id", "text", 3)
      val plain = TextDedup.minHashLshPairs(sh, 8, 2, 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val capped = TextDedup.minHashLshPairs(sh, 8, 2, 0.2, maxBandDf = Some(1024))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      capped shouldBe plain
    }
  }

  describe("TextDedup.simHash32") {
    it("is deterministic and separates near-dups from unrelated docs") {
      val sim = TextDedup.simHash32(docs, "doc_id", "text")
      val m = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sim2 = TextDedup.simHash32(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      m shouldBe sim2
      m(1L) shouldBe m(2L) // normalization-identical → same signature
      java.lang.Long.bitCount(m(1L) ^ m(3L)) should be < 12
      java.lang.Long.bitCount(m(1L) ^ m(4L)) should be > 6
    }

    it("pairs by hamming distance") {
      val sim = TextDedup.simHash32(docs, "doc_id", "text")
      val pairs = TextDedup.hammingPairs(sim, 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 2L))
    }
  }

  describe("TextDedup.simHash64") {
    it("halves stay in [0, 2^32) and normalization-identical docs collide") {
      val sim = TextDedup.simHash64(docs, "doc_id", "text")
      val m = sim.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      m.values.foreach { case (hi, lo) =>
        hi should (be >= 0L and be < (1L << 32))
        lo should (be >= 0L and be < (1L << 32))
      }
      m(1L) shouldBe m(2L)
    }

    it("banded 64-bit pairing equals the all-pairs form (recall 1)") {
      // fixture + planted near-dups: flip two tokens of each doc so true
      // pairs sit at small Hamming distance across a 64-bit signature
      val perturbed = docs.select($"doc_id" + 100L as "doc_id",
        concat($"text", lit(" zz qq")).as("text"))
      val corpus = docs.unionByName(perturbed)
      val sim = TextDedup.simHash64(corpus, "doc_id", "text")
      val brute = TextDedup.hammingPairs64(sim, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val banded = TextDedup.bandedHammingPairs64(sim, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      banded shouldBe brute
    }
  }

  describe("duplicated passages") {
    // 10-char passages, no overlap: every doc decomposes exactly;
    // "AAAAAAAAAA" is the boilerplate passage present in all four docs
    val pdocs = Seq(
      (1L, "AAAAAAAAAAshared-oneBBBBBBBBBB"),
      (2L, "AAAAAAAAAAshared-oneCCCCCCCCCC"), // shares boiler + shared-one with 1
      (3L, "AAAAAAAAAAunique-333DDDDDDDDDD"),
      (4L, "AAAAAAAAAA")                      // boilerplate only
    ).toDF("doc_id", "text")

    it("summarizes fingerprints by distinct-document frequency") {
      val out = TextDedup.duplicatedPassages(pdocs, "doc_id", "text",
          size = 10, overlap = 0, minDocs = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toList
      // two duplicated passages: the boilerplate (4 docs) and shared-one (2)
      out.sorted shouldBe List((2L, 2L), (4L, 4L))
    }

    it("pairs documents on shared passages, capping boilerplate") {
      def pairs(cap: Option[Int]) =
        TextDedup.duplicatedPassagePairs(pdocs, "doc_id", "text",
            size = 10, overlap = 0, maxPassageDf = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // uncapped: the boilerplate passage links EVERY doc pair
      pairs(None) shouldBe Map(
        (1L, 2L) -> 2L, (1L, 3L) -> 1L, (1L, 4L) -> 1L,
        (2L, 3L) -> 1L, (2L, 4L) -> 1L, (3L, 4L) -> 1L)
      // cap 3 drops the df=4 boilerplate: only the true shared passage
      // survives, exactly the pair a curation pass wants
      pairs(Some(3)) shouldBe Map((1L, 2L) -> 1L)
    }
  }

  describe("TextDedup.dedupAgainstStore") {
    val storeCorpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight and tomorrow"),
      (2L, "completely different words about spark query engines here now today")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight and tomorrow"), // exact store dup
      (11L, "the quick brown fox jumps over the lazy dog tonight and tomorrow zz qq"), // near store dup
      (12L, "fresh novel text with nothing in common with anything else whatsoever"), // novel → keep
      (13L, "fresh novel text with nothing in common with anything else whatsoever")  // in-shard dup of 12
    ).toDF("doc_id", "text")
    def run(cap: Option[Int]) = {
      val (fp, sig) = TextDedup.buildDedupStore(storeCorpus, "doc_id", "text",
        shingleN = 3, k = 8)
      TextDedup.dedupAgainstStore(delta, "doc_id", "text", fp, sig,
          shingleN = 3, k = 8, rowsPerBand = 2, minAgree = 4, maxBandDf = cap)
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    }

    it("labels exact, near, in-shard and novel delta docs independently") {
      val out = run(None)
      // identical text: exact AND near (identical signature collides)
      out(10L) shouldBe ((true, true, false, false))
      // two appended tokens: near via band hit + lane agreement, not exact
      out(11L) shouldBe ((false, true, false, false))
      // novel doc: smallest id of its fingerprint keeps
      out(12L) shouldBe ((false, false, false, true))
      // in-shard copy: shard_dup only — the store never saw it, so the
      // near flag stays false (the three flags are independent lanes)
      out(13L) shouldBe ((false, false, true, false))
    }

    it("maxBandDf cap suppresses band candidates but not the exact path") {
      val out = run(Some(0)) // degenerate cap: every band key dropped
      out(10L) shouldBe ((true, false, false, false))
      out(11L) shouldBe ((false, false, false, true))
    }
  }

  describe("TextDedup.ingestFlags (streaming-safe near-dup classification)") {
    it("rowMinHashCols equals the grouped minHashSignature lanes") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val grouped = TextDedup.minHashSignature(
        TextDedup.shingleTable(docs, "doc_id", "text", 5), 8)
        .drop("n_shingles")
      val perRow = docs.select(col("doc_id").as("id") +:
          TextDedup.rowMinHashCols(col("text"), 5, 8): _*)
        .filter(col("mh0").isNotNull) // grouped path has no row for shingle-less docs
      grouped.exceptAll(perRow).count() shouldBe 0L
      perRow.exceptAll(grouped).count() shouldBe 0L
    }

    it("flags a planted NON-identical near-duplicate, batch/stream-shared plan") {
      val storeCorpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight and tomorrow"),
        (2L, "completely different words about spark query engines here now today")
      ).toDF("doc_id", "text")
      val arriving = Seq(
        (10L, "the quick brown fox jumps over the lazy dog tonight and tomorrow"),
        (11L, "the quick brown fox jumps over the lazy dog tonight and tomorrow zz qq"),
        (12L, "fresh novel text with nothing in common with anything else whatsoever")
      ).toDF("doc_id", "text")
      val (fp, sig) = TextDedup.buildDedupStore(storeCorpus, "doc_id", "text",
        shingleN = 3, k = 8)
      val out = TextDedup.ingestFlags(arriving, "doc_id", "text", fp, sig,
          shingleN = 3, k = 8, rowsPerBand = 2, minAgree = 4)
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getBoolean(2)))).toMap
      out(10L) shouldBe ((true, true)) // identical: exact + signature collision
      out(11L) shouldBe ((false, true)) // perturbed: near path only
      out(12L) shouldBe ((false, false)) // novel
    }
  }

  describe("TextDedup.decontaminate") {
    it("flags threshold overlap, keeps disjoint and sub-shingle docs, broadcasts eval") {
      val evalSet = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text") // 6 5-shingles
      val train = Seq(
        (1L, "a b c d e f g h i j"), // all 6 eval shingles → drop at minOverlap 5
        (2L, "a b c d e x y z w v"), // shares 1 shingle → keep
        (3L, "too short")            // no 5-shingles → keep, n_overlap 0
      ).toDF("doc_id", "text")
      val out = TextDedup.decontaminate(train, evalSet, "doc_id", "text",
        n = 5, minOverlap = 5)
      out.orderBy($"id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
        .toSeq shouldBe Seq((1L, 6, 6L, false), (2L, 6, 1L, true), (3L, 0, 0L, true))
      // the eval shingle set probes as a broadcast — the train side of
      // the semi-join must not shuffle (AQE off: its leaf query stages
      // hide the joins from collect(), same caveat as TopKPlanSpec)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val semis = try {
        TextDedup.decontaminate(train, evalSet, "doc_id", "text",
            n = 5, minOverlap = 5)
          .queryExecution.executedPlan.collect {
            case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
              if b.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => b
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      semis should not be empty
    }
  }

  describe("TextDedup.removeDuplicatedSpans") {
    val unique = Map(
      1L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      2L -> "kilo lima mike november oscar papa quebec romeo sierra tango",
      3L -> "uniform victor whiskey xray yankee zulu one two three four")
    val licence = "this work is licensed under the creative commons attribution licence"

    it("cuts corpus-duplicated grams and keeps unique prose") {
      val docs = unique.toSeq.map { case (id, u) => (id, s"$u $licence") }
        .toDF("doc_id", "text")
      val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
        .orderBy($"doc_id").collect()
      out.foreach { r =>
        val clean = r.getString(1)
        // the shared licence block is cut exactly; unique prose survives
        clean shouldBe unique(r.getLong(0))
        clean should not include "licensed"
        r.getLong(2) should be >= licence.split(' ').length.toLong
      }
    }

    it("merges overlapping spans and counts within-document repetition") {
      val rep = "one two three four five six seven eight"
      val docs = Seq((1L, s"$rep $rep unique closing words here and now"))
        .toDF("doc_id", "text")
      val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
        .head()
      out.getString(1) shouldBe "unique closing words here and now"
      out.getLong(2) shouldBe 16L
    }

    it("passes short and unique documents through normalized") {
      val docs = Seq((1L, "  Too   Short "), (2L, unique(1L)))
        .toDF("doc_id", "text")
      val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
        .orderBy($"doc_id").collect()
      out(0).getString(1) shouldBe "too short"
      out(0).getLong(2) shouldBe 0L
      out(1).getString(1) shouldBe unique(1L)
      out(1).getLong(2) shouldBe 0L
    }
  }

  describe("contamination") {
    it("scores full, partial, and zero overlap against the train split") {
      val base = "a b c d e f g h i j" // 6 distinct 5-shingles
      val corpus = Seq(
        (1L, base), // train
        (2L, base), // test: identical → contamination 1.0
        (3L, "a b c d e x y z w v"), // test: shares 1 of 6 shingles
        (4L, "p q r s t u m n o k") // test: disjoint → 0.0
      ).toDF("doc_id", "text")
      val splits = Seq((1L, "train"), (2L, "test"), (3L, "test"), (4L, "test"))
        .toDF("id", "split")
      val sh = TextDedup.shingleTable(corpus, "doc_id", "text", 5)
      val out = TextDedup.contamination(sh, splits, "test", "train")
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      out shouldBe Map(2L -> 1.0, 3L -> 0.1667, 4L -> 0.0)
    }
  }
}
