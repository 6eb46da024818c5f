package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomJoin, Sampling, TermScoring}

/** Specs for the data-selection operators: Bloom semi-join reduction
  * (no false negatives; composed join ≡ plain join), stratified hash
  * sampling (determinism + rate shape), and TF-IDF term ranking. */
class SelectOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  describe("BloomJoin") {
    it("never drops a truly matching fact row (no false negatives)") {
      val dim = Tables.orders(spark, sf).select($"o_orderkey").limit(500)
      val fact = Tables.lineitem(spark, sf).select($"l_orderkey")
      val bf = BloomJoin.keyFilter(dim, "o_orderkey", expectedItems = 10000L)
      val reduced = BloomJoin.reduce(fact, "l_orderkey", bf)
      // every row of the true semi-join must survive the reduction
      val lost = fact.join(dim, $"l_orderkey" === $"o_orderkey", "left_semi")
        .except(reduced)
      lost.count() shouldBe 0L
    }

    it("composed bloomJoin returns exactly the plain join's aggregate") {
      val dim = Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_totalprice")
      val fact = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      val plain = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)), sum($"l_quantity")).head()
      val bloomed = BloomJoin.bloomJoin(fact, "l_orderkey", dim, "o_orderkey",
        expectedItems = 10000L)
        .agg(count(lit(1)), sum($"l_quantity")).head()
      bloomed.getLong(0) shouldBe plain.getLong(0)
      bloomed.getDouble(1) shouldBe (plain.getDouble(1) +- 1e-9)
    }

    it("probes with Spark's native might_contain, not a closure udf") {
      val dim = Tables.orders(spark, sf).select($"o_orderkey").limit(100)
      val fact = Tables.lineitem(spark, sf).select($"l_orderkey")
      val bf = BloomJoin.keyFilter(dim, "o_orderkey", expectedItems = 1000L)
      val plan = BloomJoin.reduce(fact, "l_orderkey", bf)
        .queryExecution.executedPlan.toString
      plan should include("might_contain")
      plan should not include "ScalaUDF"
      // the probe predicate stays inside the codegen span over the scan
      // (the executedPlan toString marks codegen stages as "*(n)")
      plan should include("*(1) Filter might_contain")
    }

    it("broadcast variant (huge-sketch path) selects exactly the native probe's rows") {
      val dim = Tables.orders(spark, sf).select($"o_orderkey").limit(100)
      val fact = Tables.lineitem(spark, sf).select($"l_orderkey")
      val bf = BloomJoin.keyFilter(dim, "o_orderkey", expectedItems = 1000L)
      val native = BloomJoin.reduce(fact, "l_orderkey", bf)
      val bcast = BloomJoin.reduceBroadcast(fact, "l_orderkey", bf)
      bcast.count() shouldBe native.count()
      bcast.except(native).count() shouldBe 0L
    }
  }

  describe("Sampling.stratifiedSample") {
    it("is deterministic across reruns and a subset of the input") {
      val docs = Tables.documents(spark, sf)
      val rates = Map("en" -> 50, "es" -> 25, "de" -> 25, "fr" -> 10)
      val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang", rates)
      val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang", rates)
      rowsOf(s1.select($"doc_id").orderBy($"doc_id")) shouldBe
        rowsOf(s2.select($"doc_id").orderBy($"doc_id"))
      s1.count() should be < docs.count()
    }

    it("drops strata with no declared rate") {
      val docs = Tables.documents(spark, sf)
      val kept = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 100))
      kept.select($"lang").distinct().collect().map(_.getString(0)).toSet shouldBe Set("en")
      // rate 100 keeps every row of the stratum
      kept.count() shouldBe docs.filter($"lang" === "en").count()
    }
  }

  describe("TermScoring") {
    it("scores rarer terms higher at equal tf, and ranks top-k per doc") {
      val docs = Seq(
        (1L, "alpha beta beta"),
        (2L, "alpha gamma"),
        (3L, "alpha delta")).toDF("doc_id", "text")
      val scored = TermScoring.tfIdf(docs, "doc_id", "text")
      val byTerm = scored.filter($"id" === 1L)
        .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
      // beta: tf=2, df=1 → high; alpha: tf=1, df=3 → ~0
      byTerm("beta") should be > byTerm("alpha")
      val top1 = TermScoring.topTermsPerDoc(scored, 1)
        .filter($"id" === 1L).head()
      top1.getString(top1.fieldIndex("term")) shouldBe "beta"
    }

    it("bm25 matches the hand-computed Okapi formula") {
      val docs = Seq(
        (1L, "a b a"),
        (2L, "b b b b"),
        (3L, "c d")).toDF("doc_id", "text")
      // N=3, dl = (3,4,2), avgdl = 3; df(a)=1, df(b)=2
      val out = TermScoring.bm25(docs, "doc_id", "text", Seq("a", "b"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      def idf(df: Int) = math.log(1 + (3 - df + 0.5) / (df + 0.5))
      def w(tf: Int, dl: Int, df: Int) =
        idf(df) * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      out(1L) shouldBe ((2L, r4(w(2, 3, 1) + w(1, 3, 2)))) // a:tf2 + b:tf1
      out(2L) shouldBe ((1L, r4(w(4, 4, 2))))              // b:tf4
      out.contains(3L) shouldBe false // no query term → no row
    }
  }
}
