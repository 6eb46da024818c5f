package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, KeyCorrection, TextDedup, Validation}

/** Property-style invariants (SURVEY.md §5.3) over seeded random
  * inputs: the contracts must hold for arbitrary data, not just the
  * fixtures. A fixed seed keeps runs deterministic; each property is
  * exercised over several independently drawn samples. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val samples = 5

  private def randRows(rng: Random): List[(Long, Long, Double)] =
    List.fill(1 + rng.nextInt(40))(
      (rng.nextInt(9).toLong, rng.nextInt(1000).toLong, rng.nextDouble() * 200 - 100))

  private def randDocs(rng: Random): List[(Long, String)] = {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    List.tabulate(1 + rng.nextInt(20))(i =>
      (i.toLong, List.fill(1 + rng.nextInt(8))(words(rng.nextInt(words.size))).mkString(" ")))
  }

  describe("Dedup.combine invariants") {
    it("always yields a unique key set and preserves totals") {
      val rng = new Random(1)
      (1 to samples).foreach { _ =>
        val rows = randRows(rng)
        val out = Dedup.combine(rows.toDF("k", "ord", "v"), Seq("k"),
          Seq(sum($"v").as("v_sum"), count(lit(1)).as("n")))
        Validation.isUnique(out, Seq("k")) shouldBe true
        out.agg(sum($"n")).head().getLong(0) shouldBe rows.length
        out.agg(sum($"v_sum")).head().getDouble(0) shouldBe
          (rows.map(_._3).sum +- 1e-6)
      }
    }
  }

  describe("KeyCorrection.correctKeys invariants") {
    it("never changes the row count and never nulls a key") {
      val rng = new Random(2)
      (1 to samples).foreach { _ =>
        val facts = randRows(rng)
        val issues = randRows(rng).map(r => (r._1, r._2 + 1000L))
        val out = KeyCorrection.correctKeys(
          facts.toDF("k", "ord", "v"), issues.toDF("k", "fixed"), "k", "fixed")
        out.count() shouldBe facts.length
        out.filter($"k".isNull).count() shouldBe 0
      }
    }
  }

  describe("union invariants") {
    it("row counts are additive") {
      val rng = new Random(3)
      (1 to samples).foreach { _ =>
        val a = randRows(rng); val b = randRows(rng)
        a.toDF("k", "ord", "v").unionByName(b.toDF("k", "ord", "v"))
          .count() shouldBe (a.length + b.length)
      }
    }
  }

  describe("TextDedup invariants") {
    it("jaccard pairs are ordered (a<b) and bounded in [threshold, 1]") {
      val rng = new Random(4)
      (1 to samples).foreach { _ =>
        val sh = TextDedup.shingleTable(
          randDocs(rng).toDF("doc_id", "text"), "doc_id", "text", 2)
        TextDedup.jaccardPairs(sh, 0.4).collect().foreach { r =>
          r.getLong(0) should be < r.getLong(1)
          r.getDouble(2) should (be >= 0.4 and be <= 1.0)
        }
      }
    }

    it("exact dedup copy counts sum to the corpus size") {
      val rng = new Random(5)
      (1 to samples).foreach { _ =>
        val docs = randDocs(rng)
        TextDedup.exactDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
          .agg(sum($"n_copies")).head().getLong(0) shouldBe docs.length
      }
    }
  }

  describe("coalesce invariants") {
    it("never increases the null count") {
      val rng = new Random(6)
      (1 to samples).foreach { _ =>
        val xs = List.fill(1 + rng.nextInt(30))(
          if (rng.nextBoolean()) Some(rng.alphanumeric.take(4).mkString) else None)
        val df = xs.map(Tuple1(_)).toDF("a")
        val before = df.filter($"a".isNull).count()
        df.select(coalesce($"a", lit("d")).as("a"))
          .filter($"a".isNull).count() should be <= before
      }
    }
  }

  private def randVecs(rng: Random, n: Int, dim: Int): List[(Long, Seq[Double])] =
    List.tabulate(n)(i => (i.toLong, Seq.fill(dim)(rng.nextDouble() * 2 - 1)))

  describe("IvfIndex invariants") {
    it("assignment partitions the corpus: every vector lands in exactly one cell") {
      val rng = new Random(6)
      (1 to samples).foreach { _ =>
        val vecs = randVecs(rng, 20 + rng.nextInt(30), 8)
        val corpus = vecs.toDF("id", "v")
        val cent = operators.IvfIndex.fitCentroids(spark, corpus, k = 4, iterations = 1)
        val assigned = operators.IvfIndex.assign(corpus, cent)
        assigned.count() shouldBe vecs.length
        Validation.isUnique(assigned, Seq("id")) shouldBe true
        assigned.filter($"cluster" < 0 || $"cluster" >= 4).count() shouldBe 0L
      }
    }
    it("probing every cell reproduces brute-force top-k exactly") {
      val rng = new Random(7)
      val vecs = randVecs(rng, 40, 8)
      val corpus = vecs.toDF("id", "v")
      val cent = operators.IvfIndex.fitCentroids(spark, corpus, k = 4, iterations = 2)
      val indexed = operators.IvfIndex.assign(corpus, cent)
      val queries = corpus.limit(3).select($"id".as("q_id"), $"v".as("qv"))
      val ivf = operators.IvfIndex.search(spark, queries, indexed, cent, k = 5, nProbe = 4)
      val brute = operators.Similarity.bruteForceTopKAgg(spark, queries,
        corpus.select($"id".as("n_id"), $"v".as("cv")), 5)
      ivf.orderBy("q_id", "rank").collect() shouldBe
        brute.orderBy("q_id", "rank").collect()
    }
  }

  describe("sessionize invariants") {
    it("sessions partition the events and never contain an internal gap > gapMs") {
      val rng = new Random(8)
      (1 to samples).foreach { _ =>
        val gap = 1000L * (1 + rng.nextInt(50))
        val events = List.fill(5 + rng.nextInt(60))(streaming.EventStreams.Event(
          rng.nextInt(4).toLong,
          new java.sql.Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L),
          "click", rng.nextDouble() * 10))
        val ds = events.toDS()
        val sessions = streaming.EventStreams.sessionize(ds, gap).collect()
        sessions.map(_.n_events).sum shouldBe events.length
        sessions.foreach { s =>
          s.session_start.getTime should be <= s.session_end.getTime
        }
        // consecutive sessions of one user are separated by more than gap
        sessions.groupBy(_.user_id).values.foreach { ss =>
          ss.sortBy(_.session_start.getTime).sliding(2).foreach {
            case Array(a, b) =>
              (b.session_start.getTime - a.session_end.getTime) should be > gap
            case _ => ()
          }
        }
      }
    }
  }

  describe("AsOfJoin invariants") {
    it("preserves left cardinality and never matches across the time bound") {
      val rng = new Random(9)
      (1 to samples).foreach { _ =>
        val left = List.fill(1 + rng.nextInt(30))(
          (rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
          .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        val right = List.fill(1 + rng.nextInt(30))(
          (rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
          .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, rng.nextDouble()) }
        val l = left.toDF("k", "t", "lid")
        val r = right.toDF("k", "t", "rid", "v")
        for (dir <- Seq("backward", "forward")) {
          val out = operators.AsOfJoin
            .asOf(l, r, Seq("k"), "t", "t", tieBreak = "rid", direction = dir)
          out.count() shouldBe left.length.toLong // left-join cardinality
          val bad =
            if (dir == "backward") out.filter($"right_t" > $"t")
            else out.filter($"right_t" < $"t")
          bad.count() shouldBe 0L
          // every match is the nearest eligible right time for its key
          val byKey = right.groupBy(_._1)
          out.collect().foreach { row =>
            Option(row.getAs[Any]("right_t")).foreach { rt =>
              val eligible = byKey.getOrElse(row.getAs[Long]("k"), Nil)
                .map(_._2.toLong)
                .filter(t => if (dir == "backward") t <= row.getAs[Long]("t")
                             else t >= row.getAs[Long]("t"))
              val nearest =
                if (dir == "backward") eligible.max else eligible.min
              rt.asInstanceOf[Long] shouldBe nearest
            }
          }
        }
      }
    }
  }

  describe("Curation.funnel invariants") {
    it("is a monotone funnel whose raw stage counts the corpus") {
      val rng = new Random(10)
      (1 to samples).foreach { _ =>
        val docs = randDocs(rng).toDF("doc_id", "text")
        val stages = operators.Curation
          .funnel(docs, "doc_id", "text", minQuality = 0.0, minTokens = 1)
          .collect()
        stages.map(_.getString(0)).toSeq shouldBe
          Seq("s1_raw", "s2_quality", "s3_exact", "s4_neardup")
        stages.head.getLong(1) shouldBe docs.count()
        stages.map(_.getLong(1)).toSeq.sliding(2).foreach {
          case Seq(a, b) => b should be <= a
          case _ => ()
        }
        stages.map(_.getLong(2)).toSeq.sliding(2).foreach {
          case Seq(a, b) => b should be <= a
          case _ => ()
        }
      }
    }
  }

  describe("Packing.exclusivePrefixSum invariants") {
    it("is order-preserving and totals to the corpus sum minus the last row") {
      val rng = new Random(11)
      (1 to samples).foreach { _ =>
        val rows = List.tabulate(1 + rng.nextInt(60))(i =>
          (i.toLong, 1L + rng.nextInt(100)))
        val out = operators.Packing
          .exclusivePrefixSum(rows.toDF("id", "sz"), "id", "sz", "p",
            bucketSize = 1L + rng.nextInt(20))
          .orderBy($"id").collect()
        // prefix of row 0 is 0; prefixes strictly increase (sizes > 0)
        out.head.getAs[Long]("p") shouldBe 0L
        out.map(_.getAs[Long]("p")).toSeq.sliding(2).foreach {
          case Seq(a, b) => b should be > a
          case _ => ()
        }
        // last prefix = total - last size
        out.last.getAs[Long]("p") shouldBe
          rows.map(_._2).sum - rows.last._2
      }
    }
  }

  describe("IncrementalAgg invariants") {
    it("merge is split-invariant: any partition of the rows gives the full recompute") {
      val rng = new Random(12)
      (1 to samples).foreach { _ =>
        val rows = randRows(rng)
        val df = rows.toDF("k", "ord", "v")
        val full = operators.IncrementalAgg.finish(
          operators.IncrementalAgg.partial(df, Seq("k"), "v"))
        // split on an arbitrary predicate, including empty sides
        val cut = rng.nextInt(1001)
        val parts = Seq(df.filter($"ord" % 1000 < cut), df.filter($"ord" % 1000 >= cut))
          .map(operators.IncrementalAgg.partial(_, Seq("k"), "v"))
        val merged = operators.IncrementalAgg.finish(
          operators.IncrementalAgg.merge(parts, Seq("k")))
        rowsOf(merged.select($"k", $"n")) shouldBe rowsOf(full.select($"k", $"n"))
        // float totals agree to summation-order tolerance
        val m = merged.orderBy($"k").collect().map(_.getDouble(2))
        val f = full.orderBy($"k").collect().map(_.getDouble(2))
        m.zip(f).foreach { case (a, b) => a shouldBe (b +- 1e-9) }
      }
    }
  }

  describe("SnapshotDiff invariants") {
    it("diff(x, x) is all-same and classes partition the key union") {
      val rng = new Random(13)
      (1 to samples).foreach { _ =>
        val rows = randRows(rng).distinctBy(_._2)
        val df = rows.toDF("k", "ord", "v").drop("k")
          .withColumnRenamed("ord", "key")
        val self = operators.SnapshotDiff.diff(df, df, Seq("key"), Seq("v"))
        self.filter($"change_type" =!= "same").count() shouldBe 0L
        self.count() shouldBe rows.length
        // against a perturbed copy, every key lands in exactly one class
        val other = df.filter($"key" % 3 =!= 0)
          .withColumn("v", when($"key" % 5 === 0, $"v" + 1.0).otherwise($"v"))
        val d = operators.SnapshotDiff.diff(df, other, Seq("key"), Seq("v"))
        d.groupBy($"key").count().filter($"count" > 1).count() shouldBe 0L
        d.count() shouldBe rows.length // union of keys = left here (other ⊆ df)
      }
    }
  }

  describe("SnapshotDiff.applyChanges inverse law") {
    it("apply(old, diff(old, new)) reconstructs new exactly") {
      val rng = new Random(15)
      (1 to samples).foreach { _ =>
        val base = randRows(rng).distinctBy(_._2)
        val old = base.toDF("g", "key", "v").drop("g")
        val neu = base.filter(_._2 % 3 != 0)
          .map { case (_, k, v) => (k, if (k % 5 == 0) v + 7.0 else v) }
          .toDF("key", "v")
        val changes = operators.SnapshotDiff.diff(old, neu, Seq("key"), Seq("v"))
        val applied = operators.SnapshotDiff.applyChanges(old, changes, Seq("key"))
        rowsOf(applied) shouldBe rowsOf(neu)
        // and with the no-op changeset filtered out, same result
        val applied2 = operators.SnapshotDiff.applyChanges(
          old, changes.filter(col("change_type") =!= "same"), Seq("key"))
        rowsOf(applied2) shouldBe rowsOf(neu)
      }
    }
  }

  describe("Linkage invariants") {
    it("self-linkage with equality comparators scores every block-mate pair fully") {
      val rng = new Random(14)
      (1 to samples).foreach { _ =>
        val rows = randRows(rng).distinctBy(_._2)
        val df = rows.toDF("blk", "id", "x")
        val pairs = operators.Linkage.link(df, df, Seq("blk"),
          Seq((col("a_id") === col("b_id"), 1.0)), threshold = 0.0)
        // every same-block pair appears; diagonal pairs score 1, others 0
        val nPerBlock = rows.groupBy(_._1).view.mapValues(_.size)
        pairs.count() shouldBe nPerBlock.values.map(n => n.toLong * n).sum
        pairs.filter($"link_score" === 1.0).count() shouldBe rows.length
      }
    }
  }
}
