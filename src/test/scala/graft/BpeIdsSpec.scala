package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** Token-id emission ([[graft.plans.BpeEncodeIds]]) and byte-level BPE:
  * the native kernel pinned against the independently-built Catalyst
  * fold twin, the deterministic vocab scheme, and the byte-fallback
  * no-OOV guarantee. */
class BpeIdsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.documents(spark, "/root/testdata/sf0.001")

  private lazy val merges: Seq[(String, String)] =
    BpeTrain.learnMerges(spark,
      BpeTrain.wordFreqs(corpus, "text"), merges = 6)
      .map { case (_, l, r, _) => (l, r) }
  private lazy val vocab: Map[String, Int] =
    BpeTrain.buildVocab(BpeTrain.wordFreqs(corpus, "text"), merges)

  describe("BpeTrain.encodeIds (native kernel)") {
    it("equals the fold-chain twin on a real corpus") {
      val native = corpus.select($"doc_id",
        BpeTrain.encodeIds($"text", merges, vocab).as("ids"))
      val fold = corpus.select($"doc_id",
        BpeTrain.encodeIdsFold($"text", merges, vocab, byteLevel = false).as("ids"))
      native.exceptAll(fold).count() shouldBe 0L
      fold.exceptAll(native).count() shouldBe 0L
      val plan = native.queryExecution.executedPlan.toString
      plan should include("bpe_encode_ids")
      (plan should not).include("lambda")
    }

    it("emits ids consistent with subwordCount and never -1 on the training corpus") {
      val both = corpus.select(
        org.apache.spark.sql.functions.size(
          BpeTrain.encodeIds($"text", merges, vocab)).cast("long").as("n_ids"),
        BpeTrain.subwordCount($"text", merges).as("n_sw"),
        array_contains(BpeTrain.encodeIds($"text", merges, vocab), -1).as("oov"))
      both.filter($"n_ids" =!= $"n_sw" || $"oov").count() shouldBe 0L
    }

    it("assigns base ids in UTF-8 byte order and merge ids in learned order") {
      val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
        .toDF("word", "freq")
      val m = BpeTrain.learnMerges(spark, words, merges = 2)
        .map { case (_, l, r, _) => (l, r) }
      m shouldBe Seq(("e", "s"), ("es", "t"))
      val v = BpeTrain.buildVocab(words, m)
      // base chars: d,e,i,l,n,o,r,s,t,w sorted → ids 0..9
      v("d") shouldBe 0
      v("w") shouldBe 9
      v("es") shouldBe 10 // merge 1
      v("est") shouldBe 11 // merge 2
      val ids = Seq(Tuple1("newest")).toDF("text")
        .select(BpeTrain.encodeIds($"text", m, v).as("ids"))
        .head().getSeq[Int](0)
      // n,e,w,est
      ids shouldBe Seq(v("n"), v("e"), v("w"), v("est"))
    }
  }

  describe("BpeTrain.decodeIds (round-trip inverse)") {
    it("decode(encode(text)) equals the space-stripped normalized text in char mode") {
      val rt = corpus.select(
        graft.operators.BpeTrain.decodeIds(
          BpeTrain.encodeIds($"text", merges, vocab), vocab).as("rt"),
        regexp_replace(graft.functions.TextAnalysis.normalizeText($"text"),
          " ", "").as("want"))
      rt.filter($"rt" =!= $"want").count() shouldBe 0L
    }

    it("re-assembles multi-byte characters from their UTF-8 bytes in byte mode") {
      val freqs = Seq(("héllo", 2L), ("wörld", 1L)).toDF("word", "freq")
      val m = BpeTrain.learnMerges(spark, freqs, merges = 3, byteLevel = true)
        .map { case (_, l, r, _) => (l, r) }
      val v = BpeTrain.buildVocab(freqs, m, byteLevel = true)
      // '中' never seen in training: byte fallback must still round-trip
      val rt = Seq(Tuple1("héllo wörld 中")).toDF("text")
        .select(graft.operators.BpeTrain.decodeIds(
          BpeTrain.encodeIds($"text", m, v, byteLevel = true),
          v, byteLevel = true).as("rt"))
        .head().getString(0)
      rt shouldBe "héllowörld中"
    }
  }

  describe("byte-level BPE") {
    it("kernel equals the fold twin in byte mode on a multi-byte fixture") {
      val fixture = corpus.withColumn("text", regexp_replace($"text", "e", "é"))
      val freqs = BpeTrain.wordFreqs(fixture, "text")
      val bm = BpeTrain.learnMerges(spark, freqs, merges = 4, byteLevel = true)
        .map { case (_, l, r, _) => (l, r) }
      val bv = BpeTrain.buildVocab(freqs, bm, byteLevel = true)
      val native = fixture.select($"doc_id",
        BpeTrain.encodeIds($"text", bm, bv, byteLevel = true).as("ids"))
      val fold = fixture.select($"doc_id",
        BpeTrain.encodeIdsFold($"text", bm, bv, byteLevel = true).as("ids"))
      native.exceptAll(fold).count() shouldBe 0L
      fold.exceptAll(native).count() shouldBe 0L
    }

    it("diverges from char mode exactly where multi-byte chars appear") {
      val fixture = corpus.withColumn("text", regexp_replace($"text", "e", "é"))
      val freqs = BpeTrain.wordFreqs(fixture, "text").localCheckpoint()
      val ch = BpeTrain.learnMerges(spark, freqs, merges = 3)
      val by = BpeTrain.learnMerges(spark, freqs, merges = 3, byteLevel = true)
      // byte mode must first re-assemble é from its two UTF-8 bytes —
      // a pair char mode cannot even represent
      by.head._2 shouldBe "c3"
      by.head._3 shouldBe "a9"
      ch.map(t => (t._2, t._3)) should not be by.map(t => (t._2, t._3))
    }

    it("byte fallback: fixed 256-symbol base encodes unseen characters with no OOV") {
      val freqs = Seq(("hello", 3L)).toDF("word", "freq")
      val m = BpeTrain.learnMerges(spark, freqs, merges = 1, byteLevel = true)
        .map { case (_, l, r, _) => (l, r) }
      val v = BpeTrain.buildVocab(freqs, m, byteLevel = true)
      v("00") shouldBe 0
      v("ff") shouldBe 255
      v.size shouldBe 257 // 256 bytes + 1 merge product
      // '中' (e4 b8 ad) never appeared in training — bytes still encode
      val ids = Seq(Tuple1("中 hello")).toDF("text")
        .select(BpeTrain.encodeIds($"text", m, v, byteLevel = true).as("ids"))
        .head().getSeq[Int](0)
      ids.take(3) shouldBe Seq(0xe4, 0xb8, 0xad)
      ids should not contain -1
    }
  }

  describe("SQL-text tokenizer surface (GraftFunctions)") {
    import graft.plans.GraftFunctions

    it("round-trips merge and vocab specs, including quote/backslash symbols") {
      val m = Seq(("a", "b"), ("'", "\\"), ("ab", "c:d,e"))
      GraftFunctions.mergesFromSpec(GraftFunctions.mergesToSpec(m)) shouldBe m
      val v = Map("a" -> 0, "'" -> 1, "\\" -> 2, "a'b" -> 3)
      GraftFunctions.vocabFromSpec(GraftFunctions.vocabToSpec(v)) shouldBe v
      GraftFunctions.mergesFromSpec("") shouldBe Seq.empty
      intercept[IllegalArgumentException] {
        GraftFunctions.mergesToSpec(Seq(("a", "b")))
      }
    }

    it("bpe_subword_count and bpe_encode_ids called from SQL equal the Scala surface") {
      GraftFunctions.register(spark)
      def sqlLit(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
      val mspec = sqlLit(GraftFunctions.mergesToSpec(merges))
      val vspec = sqlLit(GraftFunctions.vocabToSpec(vocab))
      corpus.createOrReplaceTempView("bpe_sql_docs")
      val viaSql = spark.sql(
        s"""SELECT doc_id, bpe_subword_count(text, '$mspec') AS n,
           |       bpe_encode_ids(text, '$mspec', '$vspec') AS ids
           |FROM bpe_sql_docs""".stripMargin)
      val viaScala = corpus.select($"doc_id",
        BpeTrain.subwordCount($"text", merges).as("n"),
        BpeTrain.encodeIds($"text", merges, vocab).as("ids"))
      viaSql.exceptAll(viaScala).count() shouldBe 0L
      viaScala.exceptAll(viaSql).count() shouldBe 0L
    }
  }

  describe("BpeTrain.mergeFreqs (incremental vocabulary maintenance)") {
    it("makes train(base)+update(delta) identical to a full retrain") {
      // delta overlaps base words AND introduces brand-new ones — both
      // paths through the additive merge
      val base = Seq("aa ab aa", "ab ab ba", "aa cc").toDF("text")
      val delta = Seq("zz zz aa", "zq zq zq ab").toDF("text")
      val full = base.unionByName(delta)
      val incremental = BpeTrain.learnMerges(spark,
        BpeTrain.mergeFreqs(
          BpeTrain.wordFreqs(base, "text"),
          BpeTrain.wordFreqs(delta, "text")),
        merges = 4)
      val retrained = BpeTrain.learnMerges(spark,
        BpeTrain.wordFreqs(full, "text"), merges = 4)
      incremental shouldBe retrained
      // the merged table IS wordFreqs(base ∪ delta), row for row
      val merged = BpeTrain.mergeFreqs(
        BpeTrain.wordFreqs(base, "text"), BpeTrain.wordFreqs(delta, "text"))
      val direct = BpeTrain.wordFreqs(full, "text")
      merged.exceptAll(direct).count() shouldBe 0L
      direct.exceptAll(merged).count() shouldBe 0L
    }
  }
}
