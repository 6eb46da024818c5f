package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.operators._

/** Dev-only micro-profiler: times individual pipeline stages so operator
  * costs are attributable (the bench times whole queries only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = docs.unionByName(
      docs.select(($"doc_id" + 100000L).as("doc_id"), concat($"text", lit(" zz qq")).as("text")))

    time("corpus count")(corpus.count())
    time("normalize+tokens") {
      corpus.select(graft.functions.TextAnalysis.wsTokens($"text").as("w")).count()
    }
    time("shingles explode") {
      TextDedup.shingleTable(corpus, "doc_id", "text", 5).count()
    }
    val sh = TextDedup.shingleTable(corpus, "doc_id", "text", 5)
    time("shingle self-join agg") {
      val a = sh.select($"id".as("a_id"), $"n_shingles".as("na"), $"s")
      val b = sh.select($"id".as("b_id"), $"n_shingles".as("nb"), $"s")
      a.join(b, Seq("s")).filter($"a_id" < $"b_id")
        .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("i")).count()
    }
    time("jaccard full")(TextDedup.jaccardPairs(sh, 0.3).count())
    time("minhash signature")(TextDedup.minHashSignature(sh, 8).count())
    time("lsh candidates") {
      TextDedup.lshCandidatePairs(TextDedup.minHashSignature(sh, 8), 8, 2).count()
    }
    time("minhash lsh full")(TextDedup.minHashLshPairs(sh, 8, 2, 0.3).count())
    spark.stop()
  }
}

/** Repeat one catalog query N times in a single session — separates
  * within-JVM stability from environment noise. */
object Repeat {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q30_minhash_lsh")
    val n = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      // noop sink, matching Bench: count() would let Catalyst prune
      // all columns of projection-only queries
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // process-CPU seconds ride along: the host has heavy external CPU
      // interference, so wall time alone cannot A/B two implementations —
      // CPU time measures the actual work done
      println(f"[repeat] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"(cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}

/** Dev-only NSW graph-tier scale probe with CORPUS-SCALED k — the
  * honest ×10/×100 shape: the gates pin k=8 for oracle replay, but the
  * documented 100 TB story holds cell size ~constant by scaling the
  * cell count with the corpus (and splitting when appends skew it), so
  * the probe fits k ≈ n/250 cells and times each lifecycle stage —
  * fit, assign, graph build, store save, 10% append, search, and a
  * forced worst-case split round (cap = avg/2 ⇒ every cell splits).
  *
  * Usage: `runMain graft.tools.ProbeNsw <dir> [k]` over
  * `/root/testdata/sf0.1`, `target/sf1.0`, `target/sf10`. */
object ProbeNsw {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // process-CPU seconds beside wall: this host has heavy external CPU
    // interference (the r19 lesson) — wall alone cannot A/B two
    // implementations of the same stage
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"[nsw] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  (cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%.1f s)")
      r
    }

    val e = Tables.embeddings(spark, dir)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      .localCheckpoint()
    val n = e.count()
    val k = if (args.length > 1) args(1).toInt
            else math.max(8L, n / 250).toInt
    println(s"[nsw] corpus=$n k=$k (~${n / k}/cell) dir=$dir")
    val base = e.filter($"id" % 10 < 9)
    val delta = e.filter($"id" % 10 === 9)
    val cent = time(s"fit centroids k=$k") {
      IvfIndex.fitCentroids(spark, base, k, iterations = 1).localCheckpoint()
    }
    val idxBase = time("assign base (90%)") {
      val i = IvfIndex.assign(base, cent).localCheckpoint(); i.count(); i
    }
    val graph = time("fit graph d=4") {
      val g = NswIndex.fitGraph(idxBase, degree = 4).localCheckpoint()
      g.count(); g
    }
    val stem = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val flat = s"/root/repo/target/tmp/probe_nsw_flat_$stem"
    val nsw = s"/root/repo/target/tmp/probe_nsw_g_$stem"
    time("save flat + nsw stores") {
      IvfIndex.save(cent, idxBase, flat)
      NswIndex.saveNsw(graph, NswIndex.entryPoints(idxBase, cent), nsw)
    }
    time("append 10% delta (exact)") {
      val idxDelta = IvfIndex.assign(delta, cent).localCheckpoint()
      NswIndex.appendToNsw(spark, nsw, idxBase, idxDelta, cent, degree = 4)
      idxDelta.write.mode("append").partitionBy("cluster").parquet(s"$flat/index")
    }
    time("search 100 queries") {
      val (g2, en2) = NswIndex.loadNsw(spark, nsw)
      val (c2, i2) = IvfIndex.load(spark, flat)
      val qs = e.filter($"id" < 100).select($"id".as("q_id"), $"v".as("qv"))
      NswIndex.search(spark, qs, g2, i2.select($"id", $"v", $"cluster"),
        c2, en2, k = 10, nProbe = 2, ef = 16, rounds = 2).count()
    }
    val cap = math.max(2L, (n / k) / 2)
    val split = time(s"split round (cap=$cap, worst case)") {
      NswIndex.splitOversizedNswCells(spark, flat, nsw, cap, degree = 4)
    }
    println(s"[nsw] cells split: $split")
    spark.stop()
  }
}

/** Dev-only breakdown of q58's phases: edge-building LSH chain vs the
  * label-propagation loop vs the final corpus join. */
object ProbeComponents {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft._
    import graft.operators._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe58] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = docs.unionByName(
      docs.select(($"doc_id" + 100000L).as("doc_id"),
        concat($"text", lit(" zz qq")).as("text")))
    val sh = TextDedup.shingleTable(corpus, "doc_id", "text", 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = time("edges (lsh chain)") {
      val p = TextDedup.minHashLshPairs(sh, 8, 2, 0.3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe58]   n_edges = ${p.count()}")
      p
    }
    val comps = time("connectedComponents") {
      val c = Components.connectedComponents(pairs, "a_id", "b_id")
      c.count()
      c
    }
    time("final corpus join") {
      corpus.select($"doc_id")
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"comp", $"doc_id").as("comp"))
        .orderBy($"doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
