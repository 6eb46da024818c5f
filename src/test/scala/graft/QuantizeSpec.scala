package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Quantize, Similarity}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))

  describe("Quantize (SQ8)") {
    it("fitMinMax returns exact per-dimension bounds") {
      val mm = Quantize.fitMinMax(corpus).head()
      val lo = mm.getSeq[Double](mm.fieldIndex("lo"))
      val hi = mm.getSeq[Double](mm.fieldIndex("hi"))
      val vecs = corpus.select($"v").as[Seq[Double]].collect()
      val dims = vecs.head.length
      lo.length shouldBe dims
      hi.length shouldBe dims
      (0 until dims).foreach { d =>
        lo(d) shouldBe vecs.map(_(d)).min
        hi(d) shouldBe vecs.map(_(d)).max
      }
    }

    it("codes are ints in [0, 255] and reconstruction error is within half a step") {
      val mm = Quantize.fitMinMax(corpus).localCheckpoint()
      val enc = corpus.crossJoin(broadcast(mm))
        .select($"id", $"v", $"lo", $"hi",
          Quantize.encodeSq8($"v", $"lo", $"hi").as("codes"))
        .withColumn("dv", Quantize.decodeSq8($"codes", $"lo", $"hi"))
      enc.filter(exists($"codes", c => c < 0 || c > 255)).count() shouldBe 0
      // |x − decode(encode(x))| ≤ (hi−lo)/255/2 + ulp slack, per dimension
      val perDim = enc.select($"id", posexplode(arrays_zip($"v", $"dv")))
        .select($"id", $"pos", $"col.v".as("x"), $"col.dv".as("d"))
        .join(mm.select(posexplode(arrays_zip($"lo", $"hi")))
          .select($"pos", $"col.lo".as("l"), $"col.hi".as("h")), Seq("pos"))
      perDim.filter(abs($"x" - $"d") > ($"h" - $"l") / 255.0 / 2.0 + lit(1e-12))
        .count() shouldBe 0
    }

    it("degenerate dimensions (hi = lo) encode 0 and decode back to lo") {
      val df = Seq((1L, Seq(3.5, 1.0)), (2L, Seq(3.5, 2.0))).toDF("id", "v")
      val mm = Quantize.fitMinMax(df)
      val out = Quantize.encodeCorpus(df, mm)
        .crossJoin(broadcast(mm))
        .select($"id", $"codes",
          Quantize.decodeSq8($"codes", $"lo", $"hi").as("dv"))
        .orderBy($"id").collect()
      out.map(_.getSeq[Int](1).head) shouldBe Array(0, 0)
      out.map(_.getSeq[Double](2).head) shouldBe Array(3.5, 3.5)
    }

    it("clamps vectors encoded against foreign (narrower) bounds") {
      val base = Seq((1L, Seq(0.0)), (2L, Seq(1.0))).toDF("id", "v")
      val mm = Quantize.fitMinMax(base)
      val delta = Seq((3L, Seq(-5.0)), (4L, Seq(9.0))).toDF("id", "v")
      Quantize.encodeCorpus(delta, mm).orderBy($"id")
        .collect().map(_.getSeq[Int](1).head) shouldBe Array(0, 255)
    }

    it("searchSq8 with full probe width and corpus-wide rerank equals exact brute force") {
      val e = corpus.localCheckpoint()
      val n = e.count().toInt
      val mm = Quantize.fitMinMax(e).localCheckpoint()
      val cent = IvfIndex.fitCentroids(spark, e, k = 4, iterations = 1,
        orderedMean = true).localCheckpoint()
      val indexed = IvfIndex.assign(e, cent).localCheckpoint()
      val codesIdx = indexed.crossJoin(broadcast(mm))
        .select($"cluster", $"id",
          Quantize.encodeSq8($"v", $"lo", $"hi").as("codes"))
      val fullIdx = indexed.select($"cluster", $"id", $"v")
      val queries = e.filter($"id" < 5).select($"id".as("q_id"), $"v".as("qv"))
      val got = IvfIndex.searchSq8(spark, queries, codesIdx, fullIdx, cent, mm,
          k = 5, rerank = n, nProbe = 4)
        .select($"q_id", $"rank", $"n_id")
      val truth = Similarity.bruteForceTopKAgg(spark, queries,
          e.select($"id".as("n_id"), $"v".as("cv")), 5)
        .select($"q_id", $"rank", $"n_id")
      got.exceptAll(truth).count() shouldBe 0
      truth.exceptAll(got).count() shouldBe 0
    }

    it("rejects rerank < k") {
      val e = corpus
      val mm = Quantize.fitMinMax(e)
      val cent = IvfIndex.fitCentroids(spark, e, k = 2, iterations = 0)
      an[IllegalArgumentException] should be thrownBy
        IvfIndex.searchSq8(spark, e.limit(1).select($"id".as("q_id"), $"v".as("qv")),
          e.select(lit(0).as("cluster"), $"id", $"v".as("codes")),
          e.select(lit(0).as("cluster"), $"id", $"v"), cent, mm,
          k = 5, rerank = 3, nProbe = 1)
    }
  }
}
