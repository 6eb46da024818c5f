package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.FirstNonDefaultAgg
import graft.operators.{Packing, Sampling, SkewJoin}
import graft.sources.Bucketing
import graft.streaming.EventStreams

/** Specs for the cluster-scale shapes: salted joins/aggregations,
  * bucketed co-located joins (plan-verified shuffle elimination),
  * watermark-bounded streaming dedup, and the order-exact Aggregator. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  describe("SkewJoin.saltedJoin") {
    it("produces exactly the plain join's result") {
      val facts = Tables.orders(spark, "/root/testdata/sf0.001")
      val dim = Tables.customer(spark, "/root/testdata/sf0.001")
        .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
      val plain = facts.join(dim, Seq("o_custkey"))
        .agg(count(lit(1)), sum($"o_totalprice")).head()
      val salted = SkewJoin.saltedJoin(facts, dim, Seq("o_custkey"), saltFactor = 7)
        .agg(count(lit(1)), sum($"o_totalprice")).head()
      salted.getLong(0) shouldBe plain.getLong(0)
      salted.getDouble(1) shouldBe (plain.getDouble(1) +- 1e-6)
    }

    it("spreads a single hot key across salts and still matches the plain join") {
      // 90% of facts on one key — the single-hot-KEY pathology, which is
      // finer-grained than AQE's partition-level skew split (AQE divides
      // an oversized shuffle partition; pre-salting divides the KEY)
      val facts = Tables.orders(spark, "/root/testdata/sf0.001")
        .select(when($"o_orderkey" % 10 === 0, $"o_orderkey" % 5)
          .otherwise(lit(3L)).as("k"), $"o_totalprice")
      val dim = (0L to 4L).map(k => (k, s"dim_$k")).toDF("k", "label")
      val plain = facts.join(dim, Seq("k")).groupBy($"label")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("s"))
      val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), saltFactor = 8)
        .groupBy($"label")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("s"))
      rowsOf(salted) shouldBe rowsOf(plain)
      // the mechanism: the hot key's rows actually fan out over the salt
      // domain (same salt expression the operator derives)
      val spread = facts.filter($"k" === 3L)
        .select(pmod(xxhash64(facts.columns.map(col).toIndexedSeq: _*), lit(8))
          .cast("int").as("salt"))
        .distinct().count()
      spread shouldBe 8L
    }
  }

  describe("SkewJoin.saltedAggregate") {
    it("matches the single-phase aggregation") {
      val df = Tables.orders(spark, "/root/testdata/sf0.001")
      val plain = df.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("s"))
      val salted = SkewJoin.saltedAggregate(df, Seq("o_orderstatus"), 7,
        partials = Seq(count(lit(1)).as("pn"), sum($"o_totalprice").as("ps")),
        finals = Seq(sum($"pn").as("n"), round(sum($"ps"), 2).as("s")))
      rowsOf(salted) shouldBe rowsOf(plain)
    }
  }

  describe("Packing.chunkText") {
    it("covers every character with the declared overlap, edge cases included") {
      val docs = Seq(
        (1L, "abcdefghij"),   // len 10: size 4, overlap 1 → step 3, 3 chunks
        (2L, "ab"),           // shorter than size → 1 short chunk
        (3L, "abcd")          // exactly size → 1 chunk
      ).toDF("doc_id", "text")
      val out = Packing.chunkText(docs, "doc_id", "text", size = 4, overlap = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      out shouldBe Map(
        (1L, 0L) -> "abcd", (1L, 1L) -> "defg", (1L, 2L) -> "ghij",
        (2L, 0L) -> "ab",
        (3L, 0L) -> "abcd")
      // consecutive chunks overlap by exactly `overlap` characters
      out((1L, 0L)).takeRight(1) shouldBe out((1L, 1L)).take(1)
    }
  }

  describe("Bucketing") {
    it("joins two co-bucketed tables without a shuffle exchange") {
      val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      val customers = Tables.customer(spark, "/root/testdata/sf0.001")
        .select($"c_custkey", $"c_mktsegment")
      Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 4)
      Bucketing.writeBucketed(
        customers.withColumnRenamed("c_custkey", "o_custkey"), "cust_b", "o_custkey", 4)
      val joined = Bucketing.readBucketed(spark, "orders_b")
        .join(Bucketing.readBucketed(spark, "cust_b"), Seq("o_custkey"))
      // disable auto-broadcast so the test sees the bucketed SMJ path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        plan should not include "Exchange hashpartitioning"
        joined.count() shouldBe orders.count()
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  describe("EventStreams.dedupWithinWatermark") {
    it("drops duplicate keys arriving within the watermark horizon") {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Timestamp, Long, String)]
      val stream = mem.toDF().toDF("ts", "event_id", "event_type")
      val out = EventStreams.dedupWithinWatermark(stream, Seq("event_id"))
      val query = out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      try {
        mem.addData((t(0), 1L, "click"), (t(1), 1L, "click"), (t(2), 2L, "view"))
        query.processAllAvailable()
        mem.addData((t(3), 1L, "click"), (t(4), 3L, "view"))
        query.processAllAvailable()
        val ids = spark.table("dedup_out").collect().map(_.getLong(1)).sorted
        ids shouldBe Array(1L, 2L, 3L)
      } finally query.stop()
    }
  }

  describe("TextDedup.bandedHammingPairs") {
    it("reproduces the exact all-pairs hamming result via banding") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .select($"doc_id", $"text")
      val sim = graft.operators.TextDedup.simHash32(docs, "doc_id", "text")
        .persist()
      val exact = graft.operators.TextDedup.hammingPairs(sim, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val banded = graft.operators.TextDedup.bandedHammingPairs(sim, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      banded shouldBe exact
      exact.nonEmpty shouldBe true
    }
  }

  describe("EventStreams.clickPurchaseAttribution") {
    it("joins purchases to prior clicks within the horizon (stream-stream)") {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Timestamp, Long, String, Double)]
      val stream = mem.toDF().toDF("ts", "user_id", "event_type", "value")
      val out = EventStreams.clickPurchaseAttribution(stream)
      val query = out.writeStream.format("memory").queryName("attr_out")
        .outputMode("append").start()
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      try {
        mem.addData(
          (t(0), 1L, "click", 1.0), (t(5), 1L, "purchase", 50.0),
          (t(1), 2L, "click", 2.0), (t(2), 3L, "purchase", 9.0)) // user 3: no click
        query.processAllAvailable()
        val rows = spark.table("attr_out").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
        rows shouldBe Set((1L, t(0), t(5)))
      } finally query.stop()
    }
  }

  describe("approx sketch variants") {
    it("completenessApprox tracks the exact completeness within 10%") {
      val ev = Tables.events(spark, "/root/testdata/sf0.01")
      val exact = graft.operators.Reports.completeness(ev, "event_type", "user_id")
        .collect().map(r => r.getString(0) -> r.getAs[Double]("completeness")).toMap
      val approx = graft.operators.Reports.completenessApprox(ev, "event_type", "user_id")
        .collect().map(r => r.getString(0) -> r.getAs[Double]("completeness")).toMap
      exact.foreach { case (k, v) =>
        approx(k) shouldBe (v +- math.max(0.1 * v, 0.02))
      }
    }

    it("quartilesApprox tracks all three exact quartiles within 1% at bench scale") {
      // sf0.1 on purpose — this is the bounded-error gate for the
      // documented 100 TB path, run at the same scale the bench runs
      val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
      val approx = graft.operators.Reports
        .quartilesApprox(li, "l_returnflag", $"l_extendedprice")
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val exact = li.groupBy($"l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      exact.foreach { case (k, p) =>
        val (a25, a50, a75) = approx(k)
        a25 shouldBe (p(0) +- 0.01 * p(0))
        a50 shouldBe (p(1) +- 0.01 * p(1))
        a75 shouldBe (p(2) +- 0.01 * p(2))
      }
    }

    it("winsorizeApprox bounds track the exact winsorize bounds at bench scale") {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
        .select($"l_returnflag", $"l_extendedprice")
      def bounds(df: org.apache.spark.sql.DataFrame) =
        df.select($"l_returnflag", $"p_lo", $"p_hi").distinct()
          .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val exact = bounds(graft.operators.Normalize
        .winsorize(li, "l_returnflag", "l_extendedprice", 0.05, 0.95))
      // acc = 10000 here, not the 1000 default: winsorize clips at TAIL
      // quantiles where the value density is thin, so the same rank
      // error costs more value error than at the median (measured: p05
      // at acc=1000 lands ~1.5% off). The knob exists for exactly this;
      // sketch state stays fixed-size either way.
      val approx = bounds(graft.operators.Normalize
        .winsorizeApprox(li, "l_returnflag", "l_extendedprice", 0.05, 0.95, acc = 10000))
      exact.foreach { case (k, (lo, hi)) =>
        approx(k)._1 shouldBe (lo +- 0.01 * math.abs(lo))
        approx(k)._2 shouldBe (hi +- 0.01 * math.abs(hi))
      }
      // the clip itself is a pure function of the bounds: clipped sums
      // of the two variants agree within the same tolerance
      def clippedSum(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum($"l_extendedprice_wins")).head().getDouble(0)
      val se = clippedSum(graft.operators.Normalize
        .winsorize(li, "l_returnflag", "l_extendedprice", 0.05, 0.95))
      val sa = clippedSum(graft.operators.Normalize
        .winsorizeApprox(li, "l_returnflag", "l_extendedprice", 0.05, 0.95, acc = 10000))
      sa shouldBe (se +- 0.01 * math.abs(se))
    }
  }

  describe("FirstNonDefaultAgg") {
    it("returns the first non-default in explicit order, not the minimum") {
      val df = Seq(
        (1L, 10L, "NA"), (1L, 20L, "ZERR"), (1L, 30L, "AERR"),
        (2L, 5L, "NA")).toDF("id", "ord", "err")
      val out = df.groupBy($"id")
        .agg(FirstNonDefaultAgg($"ord", $"err", "NA").as("first_err"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out(1L) shouldBe "ZERR" // file-order first, though "AERR" < "ZERR"
      out(2L) shouldBe "NA"
    }
  }

  describe("Sampling.hashSplit") {
    val docs = spark.range(0, 1000).toDF("id")

    it("partitions every row into exactly one split, deterministically") {
      val s1 = Sampling.hashSplit(docs, "id")
      s1.count() shouldBe 1000
      val byLabel = s1.groupBy($"split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      byLabel.values.sum shouldBe 1000L
      byLabel.keySet shouldBe Set("train", "val", "test")
      // train must dominate under an 80/10/10 spec
      byLabel("train") should be > byLabel("val").max(byLabel("test"))
      // re-run + re-partition → identical assignment per id
      val s2 = Sampling.hashSplit(docs.repartition(13), "id")
      s1.join(s2.withColumnRenamed("split", "split2"), Seq("id"))
        .filter($"split" =!= $"split2").count() shouldBe 0
    }

    it("rejects fractions that do not sum to 100") {
      an[IllegalArgumentException] should be thrownBy
        Sampling.hashSplit(docs, "id", Seq(("a", 50), ("b", 40)))
    }
  }

  describe("Sampling.weightedMix") {
    val docs = spark.range(0, 400).toDF("id")

    it("replicates integer weights exactly and fractions proportionally") {
      val out = Sampling.weightedMix(docs, "id", lit(3.0))
      out.count() shouldBe 1200 // exactly 3 copies each
      out.groupBy($"id").count().filter($"count" =!= 3).count() shouldBe 0
      val half = Sampling.weightedMix(docs, "id", lit(0.5)).count()
      half.toDouble shouldBe (200.0 +- 60.0) // hash-selected ~half
      // determinism: identical selection on re-run
      Sampling.weightedMix(docs, "id", lit(0.5)).count() shouldBe half
    }

    it("drops zero-weight rows and keeps copy indices 1..n") {
      val out = Sampling.weightedMix(docs, "id", lit(0.0))
      out.count() shouldBe 0
      val two = Sampling.weightedMix(docs.limit(1), "id", lit(2.0))
      two.select($"copy").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
    }
  }

  describe("Sampling.mixPlan") {
    it("hits the budget at target proportions, capping under-supplied sources") {
      // a: wants 3/6 of 600 = 300 but has 100 → caps at rate 1
      // b: wants 2/6 of 600 = 200 of 1000 → rate 0.2
      // c: wants 1/6 of 600 = 100 of 400  → rate 0.25
      val stats = Seq(("a", 100L, 3.0), ("b", 1000L, 2.0), ("c", 400L, 1.0))
        .toDF("source", "n_tokens", "w")
      val out = Sampling.mixPlan(stats, "w", "n_tokens", budget = 600L)
        .orderBy($"source")
        .collect().map(r => (r.getString(0),
          r.getAs[Double]("rate"), r.getAs[Double]("planned"))).toSeq
      out shouldBe Seq(("a", 1.0, 100.0), ("b", 0.2, 200.0), ("c", 0.25, 100.0))
    }

    it("handles a zero-token source by explicit branch, not null-skipping") {
      // "keep everything of nothing": rate 1.0, planned 0.0 — and NOT
      // via Divide-returns-null + least, which ANSI mode would break
      val stats = Seq(("a", 0L, 1.0), ("b", 100L, 1.0)).toDF("source", "n_tokens", "w")
      val out = Sampling.mixPlan(stats, "w", "n_tokens", budget = 100L)
        .orderBy($"source")
        .collect().map(r => (r.getString(0),
          r.getAs[Double]("rate"), r.getAs[Double]("planned"))).toSeq
      out shouldBe Seq(("a", 1.0, 0.0), ("b", 0.5, 50.0))
    }
  }

  describe("Packing.assembleSequences") {
    it("digest is order-deterministic under any input arrangement, ties included") {
      val rows = Seq(
        (1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
        (1L, 20L, "a"), // tie on order key → render breaks it
        (2L, 5L, "x"))
      def digests(s: Seq[(Long, Long, String)]) =
        Packing.assembleSequences(s.toDF("k", "o", "r"), "k", "o", col("r"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(4))).toMap
      val base = digests(rows)
      base(1L)._1 shouldBe 4L
      // identical digests from reversed input and a different partitioning
      digests(rows.reverse) shouldBe base
      Packing.assembleSequences(
          rows.reverse.toDF("k", "o", "r").repartition(7), "k", "o", col("r"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(4)))
        .toMap shouldBe base
      // the digest is the md5 of the pipe-joined ordered renders
      base(1L)._2 shouldBe java.security.MessageDigest.getInstance("MD5")
        .digest("a|a|b|c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

    it("orders a timestamp column at native precision, not coarsened to seconds") {
      // two events in the same second, 1 ms apart, renders chosen so
      // string order CONTRADICTS time order: a long-cast would coarsen
      // both to the same second and sort "a" before "z" — wrong
      val df = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05.002"), "a"),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05.001"), "z"))
        .toDF("k", "ts", "r")
      val row = Packing.assembleSequences(df, "k", "ts", col("r")).collect()(0)
      row.getAs[String]("digest") shouldBe
        java.security.MessageDigest.getInstance("MD5")
          .digest("z|a".getBytes("UTF-8")).map("%02x".format(_)).mkString
      // first_ord/last_ord come back as timestamps, full precision kept
      row.getAs[java.sql.Timestamp]("first_ord").getNanos shouldBe 1000000
    }
  }

  describe("Packing.ffdPack") {
    it("reproduces textbook FFD within one bucket") {
      // lengths 7,5,4,3 into capacity-10 bins: 7→b1, 5→b2, 4→b2, 3→b1
      val df = Seq((1L, 7L), (2L, 5L), (3L, 4L), (4L, 3L)).toDF("id", "len")
      val out = Packing.ffdPack(df, "id", "len", capacity = 10L, buckets = 1)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
      out shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
    }

    it("never overfills a bin, drops unpackable docs, and packs tightly") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .select($"doc_id", graft.functions.TextAnalysis.wsTokenCount($"text").as("len"))
      val packed = Packing.ffdPack(docs, "doc_id", "len",
        capacity = 256L, buckets = 8)
      val util = Packing.binUtilization(packed, 256L)
      util.filter($"bin_tokens" > 256L).count() shouldBe 0L
      // FFD on many small docs should pack well above the 50% NF bound
      util.agg(avg($"util")).head().getDouble(0) should be > 0.9
      // every packable doc is assigned exactly once
      packed.count() shouldBe docs.filter($"len" > 0 && $"len" <= 256).count()
      packed.select($"id").distinct().count() shouldBe packed.count()
      // deterministic under repartitioning
      val re = Packing.ffdPack(docs.repartition(13), "doc_id", "len", 256L, 8)
      re.exceptAll(packed).count() shouldBe 0L
      // scale shape: exactly ONE shuffle (the bucket groupBy) — the
      // fold itself is partition-local (counted as physical exchange
      // nodes on the pre-AQE plan; the string form double-prints)
      packed.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.length shouldBe 1
    }
  }

  describe("Packing.exclusivePrefixSum") {
    it("matches the naive global running sum for any bucket size") {
      val df = spark.range(0, 500).toDF("id")
        .withColumn("sz", ($"id" * 7 % 13) + 1)
      val naive = df
        .withColumn("want", coalesce(sum($"sz").over(
          org.apache.spark.sql.expressions.Window.orderBy($"id")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      for (bucket <- Seq(1L, 37L, 100L, 1000L)) {
        val got = Packing.exclusivePrefixSum(df, "id", "sz", "got", bucket)
        naive.join(got, Seq("id", "sz"))
          .filter($"want" =!= $"got").count() shouldBe 0
      }
    }

    it("assigns chunks by where each row's first unit lands") {
      val df = Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("id", "sz")
      val out = Packing.packChunks(df, "id", "sz", budget = 4L, bucketSize = 2L)
        .orderBy($"id").select($"chunk").as[Long].collect().toSeq
      // prefixes 0,3,6,9 over budget 4 → chunks 0,0,1,2
      out shouldBe Seq(0L, 0L, 1L, 2L)
    }
  }
}
