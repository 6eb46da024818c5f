package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.plans.GraftFunctions

/** Similarity search over embedding columns (`array<float>`): exact
  * brute-force cosine top-k as the baseline, random-hyperplane LSH
  * bucketing as the scale path.
  *
  * Scale design:
  *  - the query set is broadcast (it is dimension-sized); the corpus
  *    never moves except the one shuffle that ranks per-query
  *    candidates;
  *  - LSH turns the O(|Q|·|C|) scoring into a bucket-equi-join: only
  *    vectors agreeing on all `nPlanes` sign bits are scored. Plane
  *    matrix is deterministic (md5-derived ±1 entries, seed-free) so
  *    runs — and the DuckDB oracle — agree exactly;
  *  - cosine is the codegen'd [[graft.plans.CosineSimilarity]] kernel
  *    (strict sequential fold ⇒ cross-engine bit-identical values).
  */
object Similarity {

  /** Codegen'd cosine over two `array<double>` columns (register the
    * engine functions first — [[GraftFunctions.register]]). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** L2 norm of an embedding column — sequential square-sum fold, so
    * the value is bit-reproducible across engines (same guarantee as
    * [[cosineFold]]). */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Unit-norm rescale. Zero vectors pass through unchanged — a null
    * or NaN result would poison every downstream cosine, and a zero
    * vector is equally dissimilar to everything either way. Per-row
    * transform, no shuffle: normalizing a 100 TB embedding store is
    * one scan. */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n > 0.0, transform(v, x => x / n)).otherwise(v)
  }

  /** Matryoshka-style dimension truncation (Kusupati et al. 2022,
    * arXiv:2205.13147): keep the first `k` dimensions and
    * re-normalize — the serving trade where one long stored embedding
    * answers searches at a cheaper prefix dimension. Prefix + rescale
    * only; no model is consulted, which is exactly why it works for
    * MRL-trained embeddings and why it is a single codegen'd scan
    * here. */
  def truncateDims(v: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    l2Normalize(slice(v, 1, k))
  }

  /** Pure-Catalyst fallback with the same numerics (sequential fold),
    * for sessions where engine-native functions cannot be registered. */
  def cosineFold(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x)
    dot / sqrt(na * nb)
  }

  /** Exact brute-force top-k: score every (query, corpus) pair, rank
    * per query. `queries` must be small (it is broadcast); the scored
    * pairs shuffle once on query id for the ranking window. */
  def bruteForceTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                     k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
  }

  /** Exact brute-force top-k via the bounded-heap aggregation
    * ([[graft.functions.TopKAgg]]) instead of a ranking window: partial
    * aggregation trims every partition's candidates to k before the
    * shuffle, so the exchange carries k×|queries| rows rather than
    * |corpus|×|queries|. Same results as [[bruteForceTopK]] (spec-
    * verified); this is the shape that survives a 100 TB corpus. */
  def bruteForceTopKAgg(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                        k: Int): DataFrame = {
    GraftFunctions.register(spark)
    corpus.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg(k, col("cos"), col("n_id")).as("topk"))
      .select(col("q_id"), posexplode(col("topk.items")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("n_id"), round(col("col.score"), 4).as("cos"))
  }

  /** Deterministic ±1 hyperplane matrix: sign of plane j, dim i is the
    * parity of the first byte of md5("j:i"). Seed-free ⇒ reproducible
    * everywhere, including inside the SQL oracle (same literals). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      Array.tabulate(dim) { i =>
        val d = md.digest(s"$j:$i".getBytes(StandardCharsets.UTF_8))
        if ((d(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Johnson–Lindenstrauss random projection to `planes.size` dims:
    * `y_j = ⟨v, plane_j⟩ / √k` over the deterministic ±1 matrix of
    * [[hyperplanes]] (a Rademacher projection — Achlioptas 2003 shows
    * ±1 entries carry the JL distance-preservation guarantee). The
    * serving trade [[truncateDims]] makes for MRL-trained embeddings,
    * available for ANY embedding: distances survive to within
    * 1±ε at k = O(log n / ε²) target dims, at k/d of the storage and
    * scoring cost. Pure per-row projection — reducing a 100 TB
    * embedding store is one scan, no shuffle; the matrix rides the
    * plan as literals (seed-free, engine-replayable). */
  def projectJL(v: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.nonEmpty, "projectJL needs at least one plane")
    val scale = math.sqrt(planes.size.toDouble)
    array(planes.map { p =>
      val planeCol = array(p.map(lit).toIndexedSeq: _*)
      aggregate(zip_with(v, planeCol, (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x) / scale
    }: _*)
  }

  /** LSH bucket id: one sign bit per hyperplane, packed into a long.
    * The per-plane dot uses the same sequential-fold numerics as
    * everything else (sign decisions must agree with the oracle). */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(lit).toIndexedSeq: _*)
      val dot = aggregate(zip_with(v, planeCol, (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN near-dup pairs: bucket equi-join (only same-bucket vectors are
    * scored) + exact cosine verification at `threshold`. Input must
    * have columns (id, v: array<double>).
    *
    * `maxBucketSize` is the skew guard (mirror of the shingle path's
    * `maxShingleDf`): a bucket holding m vectors contributes m²
    * scored pairs, so a degenerate corpus — near-identical embeddings
    * all falling on the same side of every hyperplane — makes one hot
    * bucket quadratic. Buckets larger than the cap are dropped before
    * the self-join (one count agg over the bucketed table; the hot
    * bucket's pairs are sacrificed rather than scored). */
  def annLshPairs(spark: SparkSession, corpus: DataFrame,
                  planes: Seq[Array[Double]], threshold: Double,
                  maxBucketSize: Option[Int] = None): DataFrame = {
    GraftFunctions.register(spark)
    val allBucketed = corpus.withColumn("bucket", lshBucket(col("v"), planes))
    val bucketed = maxBucketSize match {
      case Some(cap) =>
        // persist: the bucketed table feeds both self-join sides AND the
        // hot-bucket agg; unpersisted, the bucket hash runs per subtree.
        // Cache is session-owned (see TextDedup's cache contract):
        // long-lived callers clearCache() between batches
        val cached = allBucketed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hot = cached.groupBy(col("bucket"))
          .agg(count(lit(1)).as("sz"))
          .filter(col("sz") > cap).select(col("bucket"))
        cached.join(hot, Seq("bucket"), "left_anti")
      case None => allBucketed
    }
    val a = bucketed.select(col("id").as("a_id"), col("v").as("va"), col("bucket"))
    val b = bucketed.select(col("id").as("b_id"), col("v").as("vb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }

  /** Exact all-pairs cosine ≥ threshold (brute force — the correctness
    * oracle for [[annLshPairs]]; replaced by it at scale). */
  def bruteForcePairs(spark: SparkSession, corpus: DataFrame,
                      threshold: Double): DataFrame = {
    GraftFunctions.register(spark)
    val a = corpus.select(col("id").as("a_id"), col("v").as("va"))
    val b = corpus.select(col("id").as("b_id"), col("v").as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }

  /** Semantic deduplication in the SemDeDup shape (public method:
    * Abbas et al. 2023, arXiv:2303.09540 — cluster embeddings, then
    * look for near-duplicates only WITHIN a cluster): deterministic
    * Lloyd fit ([[IvfIndex.fitCentroids]], ordered-mean for
    * cross-engine bit-reproducibility), per-cell cosine pairs, and a
    * vector is dropped iff a smaller-id same-cell neighbor scores
    * ≥ `threshold` (the smallest member of each near-dup set survives —
    * deterministic, order-free, and expressible in plain SQL for the
    * gate, unlike a sequentially-greedy sweep).
    *
    * Scale shape: the pair join is keyed on the cell, so the work is
    * Σ|cell|² ≈ n²/k — pick k ~ n/10⁴ to bound cells, exactly the IVF
    * sizing rule. Centroids broadcast at assignment; no all-pairs join
    * exists anywhere. Known recall trade (inherited from SemDeDup): a
    * near-dup pair straddling a cell boundary is missed — raise k only
    * as far as the cell-size bound needs, or run [[annLshPairs]] for a
    * recall-1 candidate set.
    *
    * Returns `(id, cluster, keep)` for every corpus row. */
  def semanticDedup(spark: SparkSession, corpus: DataFrame, k: Int,
                    iterations: Int, threshold: Double): DataFrame = {
    // cent is consumed exactly once (by assign) — no persist; idx feeds
    // both pair sides AND the final labeling, so it is the one to cache.
    // Session-owned cache — see TextDedup's cache contract
    val cent = IvfIndex.fitCentroids(spark, corpus, k, iterations, orderedMean = true)
    val idx = IvfIndex.assign(corpus, cent)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = idx.select(col("cluster"), col("id").as("a_id"), col("v").as("va"))
    val b = idx.select(col("cluster"), col("id").as("b_id"), col("v").as("vb"))
    val dropped = a.join(b, Seq("cluster")).filter(col("a_id") < col("b_id"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("b_id").as("id")).distinct()
    idx.select(col("id"), col("cluster"))
      .join(dropped.withColumn("dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(!col("dup"), lit(true)).as("keep"))
  }

  /** [[semanticDedup]] with the cell count derived from the corpus
    * instead of hand-picked: `k = max(kFloor, ceil(n / targetCellSize))`,
    * which bounds expected per-cell pair work at ~targetCellSize²
    * regardless of corpus size and makes PAIR work
    * Σ|cell|² ≈ n·targetCellSize — LINEAR in n, where a fixed k scales
    * as n²/k (the q100 probe measured exactly that ×5-at-10× curve
    * before this existed). The other term is centroid ASSIGNMENT:
    * n·k = n²/targetCellSize cosine scores, so the linear-in-n claim
    * holds only while n ≪ targetCellSize² — with the 10⁴ default that
    * covers corpora to ~10⁸ vectors; past that, balance the two terms
    * with targetCellSize ~ √n (total work 2·n^1.5) or assign through a
    * two-level centroid tree. This is measured, not theoretical: the
    * round-5 100× probe ran the q100 gate's test-scale cell size (100)
    * at n = 4·10⁵, deriving k = 4000, and the 1.6×10⁹-cosine assignment
    * dominated the cold pass at 465 s — exactly the n²/c term — while
    * the same corpus under the production default would assign with
    * k = 40. targetCellSize ~10⁴ is the IVF sizing rule from the
    * scaladoc above; the floor keeps tiny corpora from degenerating to
    * one cell per vector. Costs one count() pass over the corpus before
    * the fit — at scale that is a parquet metadata-level scan, noise
    * next to the Lloyd iteration it sizes. */
  def semanticDedupAuto(spark: SparkSession, corpus: DataFrame,
                        iterations: Int, threshold: Double,
                        targetCellSize: Long = 10000L, kFloor: Int = 8): DataFrame = {
    require(targetCellSize > 0, s"targetCellSize must be positive, got $targetCellSize")
    require(kFloor > 0, s"kFloor must be positive, got $kFloor")
    val n = corpus.count()
    val k = math.max(kFloor.toLong, (n + targetCellSize - 1) / targetCellSize)
    require(k <= Int.MaxValue, s"derived k=$k overflows Int")
    semanticDedup(spark, corpus, k.toInt, iterations, threshold)
  }

  /** [[semanticDedup]] with the BALANCED cell count `k = ⌈√n⌉`
    * (floored at kFloor): assignment work is n·k and pair work is
    * n²/k, so their sum is minimized where the two terms meet —
    * k = √n — giving total work 2·n^1.5 instead of a quadratic term
    * either side of the trade (the round-5 100× probe measured the
    * assignment side dominating at 465 s cold when k overshot; see
    * [[semanticDedupAuto]]). Use this form when nothing is known
    * about the corpus; use `semanticDedupAuto` when a recall target
    * fixes the cell size (bigger cells = fewer boundary misses). */
  def semanticDedupBalanced(spark: SparkSession, corpus: DataFrame,
                            iterations: Int, threshold: Double,
                            kFloor: Int = 8): DataFrame = {
    require(kFloor > 0, s"kFloor must be positive, got $kFloor")
    val n = corpus.count()
    val k = math.max(kFloor.toLong, math.ceil(math.sqrt(n.toDouble)).toLong)
    require(k <= Int.MaxValue, s"derived k=$k overflows Int")
    semanticDedup(spark, corpus, k.toInt, iterations, threshold)
  }
}
