package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI 2011) — the
  * bytes-per-vector ANN tier: the embedding is split into `m`
  * subvectors, each subspace gets its own `ks`-codeword codebook
  * (deterministic Lloyd, L2 metric), and a vector stores only its `m`
  * codeword ids. At d=64 doubles, m=4 codes ≈ 4 bytes against 512 —
  * two orders of magnitude past [[Quantize]]'s SQ8, the tier that
  * keeps a 10¹⁰-vector index in cluster memory. Search is
  * asymmetric-distance computation (ADC): the query stays
  * full-precision, one `m × ks` distance table per query is built
  * against the codebooks (metadata-sized, broadcast), and a
  * candidate's approximate distance is `m` table lookups summed — no
  * per-candidate arithmetic beyond the lookup fold, and the corpus
  * never moves.
  *
  * Determinism (the oracle replays every stage): seeds are the first
  * `ks` subvectors in id order per subspace, assignment ties break
  * toward the lower codeword id, means are strict id-ordered folds,
  * fitted codebooks are re-numbered DENSELY per subspace (empty
  * codewords vanish identically on both engines, so positional
  * distance-table lookups stay aligned), and all distances are
  * fixed-order double folds.
  */
object PqIndex {

  /** Squared L2 as a strict sequential fold — the PQ metric, engine-
    * replayable like [[Similarity.cosineFold]]. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Explode `(carry…, vCol)` into `(carry…, sub, sv)` — one row per
    * subspace. Pure projection+generate: no shuffle. */
  private def subVectors(df: DataFrame, carry: Seq[String], vCol: String,
                         m: Int, subDim: Int): DataFrame =
    df.select(carry.map(col) :+ posexplode(array((0 until m).map(j =>
        slice(col(vCol), j * subDim + 1, subDim)): _*)).as(Seq("sub", "sv")): _*)

  /** Argmin-L2 codeword per `(id, sub)` against broadcast codebooks;
    * ties toward the lower code. Same map-side-collapse shape as
    * [[IvfIndex.assign]]: the shuffle moves one row per (id, sub). */
  private def assign(subv: DataFrame, codebooks: DataFrame): DataFrame =
    subv.join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2", l2Sq(col("sv"), col("centroid")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(struct(col("code"), col("sv")),
        struct(col("d2"), col("code"))).as("best"))
      .select(col("id"), col("sub"), col("best.sv").as("sv"),
        col("best.code").as("code"))

  /** Fail fast when the caller's `(m, subDim)` disagree with the shape
    * of the fitted codebooks — a mismatch otherwise produces NULL
    * distances (zip_with pads the shorter side) and silently garbage
    * assignments. One aggregate over the metadata-sized codebook
    * frame. */
  private def requireCodebookShape(codebooks: DataFrame, m: Int,
                                   subDim: Int): Unit = {
    val r = codebooks.agg(
      countDistinct(col("sub")).as("m"),
      min(size(col("centroid"))).as("dmin"),
      max(size(col("centroid"))).as("dmax")).head()
    require(r.getLong(0) == m,
      s"codebooks cover ${r.getLong(0)} subspaces, caller said m=$m")
    require(r.getInt(1) == subDim && r.getInt(2) == subDim,
      s"codebook centroids span ${r.getInt(1)}..${r.getInt(2)} dims, " +
        s"caller said subDim=$subDim")
  }

  /** Per-key `m × ks` ADC distance tables: `(keys…, dtab)` where
    * `dtab(sub)(code)` = ‖q_sub − codeword‖². `keys` is `q_id` for
    * raw-vector ADC and `(q_id, cluster)` for residual ADC (one table
    * per probed cell — the query residual differs per cell). Rows
    * collapse to one per key tuple — metadata-sized, built once and
    * broadcast by every consumer. ONE implementation for
    * [[adcSearch]]/[[ivfAdcSearch]] so fold order and sort keys cannot
    * drift between them. */
  private def distanceTables(queries: DataFrame, codebooks: DataFrame,
                             m: Int, subDim: Int,
                             keys: Seq[String] = Seq("q_id")): DataFrame =
    subVectors(queries, keys, "qv", m, subDim)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2", l2Sq(col("sv"), col("centroid")))
      .groupBy((keys :+ "sub").map(col): _*)
      .agg(array_sort(collect_list(struct(col("code"), col("d2")))).as("p"))
      .select(keys.map(col) :+ col("sub") :+
        expr("transform(p, x -> x.d2)").as("drow"): _*)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("sub"), col("drow")))).as("p"))
      .select(keys.map(col) :+ expr("transform(p, x -> x.drow)").as("dtab"): _*)

  /** A candidate's approximate squared distance: m dense-code lookups
    * into the query's distance table, summed by the usual 0.0-seeded
    * fold. */
  private def adcDistance(codes: Column, dtab: Column): Column =
    aggregate(zip_with(codes, dtab, (c, row) => get(row, c)),
      lit(0.0), (acc, x) => acc + x)

  /** Fit per-subspace codebooks over `(id, v: array<double>)` →
    * `(sub, code, centroid)`, `code` dense 0..|codebook(sub)|−1.
    * All `m` subspaces train in ONE keyed dataflow (the subspace id
    * rides the rows) — not m sequential fits. */
  def fitCodebooks(spark: SparkSession, corpus: DataFrame, m: Int, ks: Int,
                   iterations: Int): DataFrame = {
    require(m > 0 && ks > 0 && iterations >= 0, s"bad PQ params m=$m ks=$ks")
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val subv = corpus.select(col("id"), col("v"))
      .transform(subVectors(_, Seq("id"), "v", m, subDim))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ws = Window.partitionBy(col("sub")).orderBy(col("id"))
    var cb = subv.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= ks)
      .select(col("sub"), (col("rn") - 1).as("code"), col("sv").as("centroid"))
    (1 to iterations).foreach { _ =>
      cb = assign(subv, cb)
        .select(col("sub"), col("code"), col("id"),
          posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("sub"), col("code"), col("dim"))
        .agg((aggregate(
          transform(array_sort(collect_list(struct(col("id"), col("x")))),
            p => p.getField("x")),
          lit(0d), (acc, x) => acc + x) / count(lit(1))).as("mv"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("pairs"))
        .select(col("sub"), col("code"),
          expr("transform(pairs, p -> p.mv)").as("centroid"))
    }
    // dense renumber per subspace: an empty codeword drops out of the
    // grouped update on every engine identically; dense ids keep the
    // positional ADC table lookups aligned with the codebook
    val wd = Window.partitionBy(col("sub")).orderBy(col("code"))
    val dense = cb.withColumn("code", (row_number().over(wd) - 1).cast("int"))
    // materialize the (m·ks)-row codebook, then release the exploded
    // corpus cache — callers re-derive subvectors per use
    val out = dense.localCheckpoint()
    subv.unpersist()
    out
  }

  /** PQ-encode the corpus: `(id, codes: array<int>)`, `codes(j)` = the
    * dense codeword id of subspace j. One scan + one (id, sub)-keyed
    * collapse; the output is the m-byte-per-vector fast tier. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int,
             subDim: Int): DataFrame = {
    requireCodebookShape(codebooks, m, subDim)
    assign(subVectors(corpus, Seq("id"), "v", m, subDim), codebooks)
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("p"))
      .select(col("id"), expr("transform(p, x -> x.code)").as("codes"))
  }

  /** Coarse residuals: `(id, v − centroid(cluster), cluster)` — the
    * input the canonical FAISS IVFADC fits its codebooks on. The code
    * budget then encodes only the within-cell variance, which is below
    * raw variance in proportion to what the coarse quantizer explains
    * — a large win on clustered real corpora. (On the near-uniform
    * synthetic gate corpus the cells explain little and the measured
    * ADC error is comparable to raw-vector PQ: mean |ad2−d2| 0.59 vs
    * 0.55 at sf0.01 — the gate certifies the mechanics, not a recall
    * advantage the data cannot show.) Pure broadcast join + per-row
    * zip_with: one scan, no shuffle. */
  def residuals(indexed: DataFrame, centroids: DataFrame): DataFrame =
    indexed.join(broadcast(centroids), Seq("cluster"))
      .select(col("id"),
        zip_with(col("v"), col("centroid"), (x, c) => x - c).as("v"),
        col("cluster"))

  /** Persist a fitted two-tier index: coarse centroids and PQ
    * codebooks (metadata-sized) plus BOTH tiers cluster-partitioned —
    * `codes` (the m-byte hot tier a probe reads) and `full` (the cold
    * rerank tier). One directory per cell per tier, so
    * [[ivfAdcSearch]]'s probe joins prune both reads to the nProbe
    * probed cells (dynamic partition pruning), exactly the
    * [[IvfIndex.save]] layout doubled. Doubles/ints round-trip
    * parquet binary-exact, so search-after-reload ≡ in-memory search
    * bit-for-bit (q142 gates it on q141's oracle).
    *
    * GENERATIONAL since round 10: the four tables land under
    * `dir/g<n>/` and a one-long manifest (`dir/manifest`,
    * tmp+rename-swapped — [[graft.sources.StoreFs]]) is the single
    * commit point, the [[graft.operators.TextDedup
    * .writeDedupStoreBucketed]] pattern. A crash between table writes
    * leaves readers on the previous COMPLETE generation (the old
    * overwrite-in-place layout corrupted the live store instead);
    * `retainGenerations` keeps that many newest committed generations
    * after the swap (1 = current only — superseded data is dropped,
    * the old behavior), so a refresh can leave history for readers
    * pinned to an older generation and [[vacuumTwoTier]] reclaims it
    * later. */
  def saveTwoTier(centroids: DataFrame, codebooks: DataFrame,
                  codesIdx: DataFrame, fullIdx: DataFrame, dir: String,
                  retainGenerations: Int = 1): Unit = {
    require(retainGenerations >= 1,
      s"retainGenerations must be >= 1, got $retainGenerations")
    val gen = graft.sources.StoreFs.readManifest(s"$dir/manifest")
      .getOrElse(0L) + 1L
    val g = s"$dir/g$gen"
    centroids.write.mode("overwrite").parquet(s"$g/centroids")
    Failpoints.hit("twotier:after-centroids")
    codebooks.write.mode("overwrite").parquet(s"$g/codebooks")
    // one file per cell, not one per (task, cell) — see IvfIndex.save
    codesIdx.repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$g/codes")
    Failpoints.hit("twotier:after-codes")
    fullIdx.repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$g/full")
    graft.sources.StoreFs.commitManifest(s"$dir/manifest", gen)
    vacuumTwoTier(dir, keepLast = retainGenerations)
  }

  /** Retention for a generational two-tier store: drop all but the
    * newest `keepLast` COMMITTED generations. Generations above the
    * manifest (an in-flight writer's) are never touched; a store with
    * no manifest (never committed, or legacy flat layout) is left
    * alone. Safe beside readers pinned to any RETAINED generation —
    * a reader's resolved `g<n>` paths stay valid until a vacuum with
    * a smaller `keepLast` reclaims them. */
  def vacuumTwoTier(dir: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val current = graft.sources.StoreFs.readManifest(s"$dir/manifest")
      .getOrElse(return)
    val genRe = "g(\\d+)".r
    val committed = graft.sources.StoreFs.childNames(dir)
      .collect { case genRe(g) if g.toLong <= current => g.toLong }.sorted
    committed.dropRight(keepLast)
      .foreach(g => graft.sources.StoreFs.deleteChild(dir, s"g$g"))
  }

  /** The current committed generation's root — or the legacy flat
    * layout (`dir/centroids` etc.) for stores written before the
    * generational format. */
  private def twoTierRoot(dir: String): String =
    graft.sources.StoreFs.readManifest(s"$dir/manifest") match {
      case Some(g) => s"$dir/g$g"
      case None => dir
    }

  /** INCREMENTAL two-tier maintenance: append a `delta` of `(id, v)`
    * rows to a [[saveTwoTier]]d index WITHOUT refitting — assign the
    * delta to the persisted coarse centroids, encode it with the
    * persisted codebooks (`residual` must match the regime the index
    * was built with), and append both tiers' cluster partitions. With
    * centroids and codebooks FIXED, append ≡ full rebuild with the
    * same models EXACTLY (q146 gates it); drift accumulates only in
    * how well the old models fit the new data — re-tune with
    * [[IvfIndex.tuneNProbe]]-style recall checks, refit when recall
    * decays. Same exclusive-access contract as
    * [[IvfIndex.appendToIndex]]. Returns the delta's assignments. */
  def appendToTwoTier(spark: SparkSession, delta: DataFrame, dir: String,
                      m: Int, subDim: Int,
                      residual: Boolean = false): DataFrame = {
    val root = twoTierRoot(dir)
    val cent = spark.read.parquet(s"$root/centroids")
    val cb = spark.read.parquet(s"$root/codebooks")
    val assigned = IvfIndex.assign(delta, cent).localCheckpoint()
    val encSrc =
      if (residual) residuals(assigned, cent).select(col("id"), col("v"))
      else assigned.select(col("id"), col("v"))
    encode(encSrc, cb, m, subDim)
      .join(assigned.select(col("id"), col("cluster")), Seq("id"))
      .select(col("cluster"), col("id"), col("codes"))
      .write.mode("append").partitionBy("cluster").parquet(s"$root/codes")
    assigned.select(col("cluster"), col("id"), col("v"))
      .write.mode("append").partitionBy("cluster").parquet(s"$root/full")
    assigned
  }

  /** DELETE documents from a [[saveTwoTier]]d store — the third
    * lifecycle verb (build / append / REMOVE: takedown, retraction,
    * right-to-be-forgotten). Both tiers are strictly per-document rows
    * (no cross-row state — unlike the NSW graph's neighbor lists), so
    * filtering them at read time is EXACTLY a rebuild without the ids;
    * the delete itself is therefore a TOMBSTONE append — O(|ids|), no
    * store rewrite, applied to every generation by [[loadTwoTier]]'s
    * anti-join (tombstoned rows never reach a search; q190 gates the
    * ≡-rebuild equivalence). [[compactTwoTier]] folds tombstones into
    * a rewritten generation when the dead weight warrants it.
    *
    * Caveat (documented, not checked — the check would cost a join per
    * append): tombstones are store-wide, so RE-ingesting a previously
    * deleted id via [[appendToTwoTier]] requires [[compactTwoTier]]
    * first, or the anti-join hides the re-added rows. */
  def deleteFromTwoTier(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    ids.select(col("id").cast("long").as("id")).coalesce(1)
      .write.mode("append").parquet(s"$dir/tombstones")

  /** The store's tombstone ids, if any were ever written. */
  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    if (graft.sources.StoreFs.childNames(dir).contains("tombstones"))
      Some(spark.read.parquet(s"$dir/tombstones"))
    else None

  /** Fold the tombstones into the store: rewrite the current
    * generation WITHOUT the tombstoned rows (centroids/codebooks are
    * fit parameters, unchanged by document removal), commit it, then
    * drop the tombstone table. Crash between commit and drop is
    * harmless — the anti-join of already-absent ids is a no-op. */
  def compactTwoTier(spark: SparkSession, dir: String,
                     retainGenerations: Int = 1): Unit = {
    if (tombstones(spark, dir).isEmpty) return
    val (cent, cb, codes, full) = loadTwoTier(spark, dir) // already filtered
    saveTwoTier(cent, cb, codes, full, dir, retainGenerations)
    graft.sources.StoreFs.deleteChild(dir, "tombstones")
  }

  /** Reload a [[saveTwoTier]]d index (its current committed
    * generation): `(centroids, codebooks, codesIdx, fullIdx)`, with
    * any [[deleteFromTwoTier]] tombstones applied to both tiers
    * (broadcast anti-join — the static sides keep their partitioning,
    * no exchange is added when the store has no tombstones). */
  def loadTwoTier(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val root = twoTierRoot(dir)
    val drop = tombstones(spark, dir)
    def live(df: DataFrame): DataFrame = drop match {
      case Some(t) => df.join(broadcast(t), Seq("id"), "left_anti")
      case None => df
    }
    (spark.read.parquet(s"$root/centroids"),
      spark.read.parquet(s"$root/codebooks"),
      live(spark.read.parquet(s"$root/codes")),
      live(spark.read.parquet(s"$root/full")))
  }

  /** IVF + PQ + ADC — the FAISS-IVFADC serving composition, the full
    * ANN ladder in one call: queries pick their `nProbe` nearest
    * coarse cells ([[IvfIndex]] centroids, broadcast), ADC scores ONLY
    * the codes of vectors in the probed cells (`codesIdx`:
    * `(cluster, id, codes)` — cluster-partitioned on disk, the probe
    * join prunes to nProbe directories), the best `rerank` candidates
    * per query are re-scored exactly against the full-precision cold
    * tier (`fullIdx`, same pruned read), and the final top-k is exact
    * within the surfaced candidates. Memory at scale: the hot tier is
    * m bytes/vector + the m×ks codebooks; the cold tier is touched for
    * rerank·|queries| rows only. Ranking is ascending approximate L2
    * (ADC), then ascending exact L2 on rerank; output carries both
    * distances.
    *
    * Two codebook regimes, chosen by `residual`:
    *  - `false`: codebooks fitted on RAW vectors — one distance table
    *    per query, the same codebooks serve any cell layout;
    *  - `true` (canonical FAISS IVFADC): codebooks fitted on
    *    [[residuals]] and `codesIdx` carries residual codes — the
    *    query side subtracts each PROBED cell's centroid first, so the
    *    distance tables are keyed `(q_id, cluster)` (nProbe tables per
    *    query — still metadata-sized, still broadcast). Same code
    *    budget, much tighter reconstruction. */
  /** PREDICATE-AWARE IVFADC serving — the filtered-search face of the
    * full composition ([[IvfIndex.searchFiltered]]'s contract applied
    * to the two-tier path): the predicate restricts the ADC candidate
    * set INSIDE the probed cells BEFORE the approximate trim, so no
    * non-matching row can occupy an ADC slot or a rerank slot, and a
    * selective predicate cannot starve the answer the way
    * post-filtering a plain top-k does — the result is the composition
    * applied to exactly the matching members of the probed cells (q197
    * gates it against the filtered oracle replay). `pred` ranges over
    * the columns of `fullIdx` (attributes beside the cold tier);
    * implementation is a semi-join restriction of the hot tier, the
    * rerank stage then only ever sees allowed survivors. */
  def ivfAdcSearchFiltered(spark: SparkSession, queries: DataFrame,
                           codesIdx: DataFrame, fullIdx: DataFrame,
                           centroids: DataFrame, codebooks: DataFrame,
                           m: Int, subDim: Int, k: Int, rerank: Int,
                           nProbe: Int, pred: org.apache.spark.sql.Column,
                           residual: Boolean = false): DataFrame = {
    val allowed = fullIdx.filter(pred).select(col("cluster"), col("id"))
    ivfAdcSearch(spark, queries,
      codesIdx.join(allowed, Seq("cluster", "id"), "left_semi"),
      fullIdx, centroids, codebooks, m, subDim, k, rerank, nProbe, residual)
  }

  def ivfAdcSearch(spark: SparkSession, queries: DataFrame, codesIdx: DataFrame,
                   fullIdx: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                   m: Int, subDim: Int, k: Int, rerank: Int,
                   nProbe: Int, residual: Boolean = false): DataFrame = {
    require(k > 0 && rerank >= k, s"need rerank >= k > 0, got k=$k rerank=$rerank")
    requireCodebookShape(codebooks, m, subDim)
    val probes = IvfIndex.probeCells(spark, queries, centroids, nProbe)
    val dtabKeys = if (residual) Seq("q_id", "cluster") else Seq("q_id")
    val dtab =
      if (residual) {
        val rq = probes.join(broadcast(centroids), Seq("cluster"))
          .select(col("q_id"), col("cluster"),
            zip_with(col("qv"), col("centroid"), (x, c) => x - c).as("qv"))
        distanceTables(rq, codebooks, m, subDim, dtabKeys)
      } else distanceTables(queries, codebooks, m, subDim, dtabKeys)
    val approx = codesIdx
      .join(broadcast(probes.select(col("q_id"), col("cluster"))), Seq("cluster"))
      .join(broadcast(dtab), dtabKeys)
      .withColumn("ad2", adcDistance(col("codes"), col("dtab")))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg(rerank, -col("ad2"), col("id")).as("topk"))
      .select(col("q_id"), explode(col("topk.items")).as("c"))
      .select(col("q_id"), col("c.id").as("id"), (-col("c.score")).as("ad2"))
    val fullCand = fullIdx.join(broadcast(probes), Seq("cluster"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("id").asc)
    fullCand.join(broadcast(approx), Seq("q_id", "id"))
      .withColumn("d2", l2Sq(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col("id").as("n_id"), (round(col("ad2"), 4) + 0.0).as("ad2"),
        (round(col("d2"), 4) + 0.0).as("d2"))
  }

  /** ADC top-k: queries `(q_id, qv)` against the encoded corpus
    * `(id, codes)`. Builds the per-query `m × ks` distance table
    * (metadata-sized: |queries|·m·ks rows collapse to one row per
    * query, broadcast), then scores every candidate with an m-lookup
    * fold and trims to k per query with the bounded-heap
    * [[graft.functions.TopKAgg]] (shuffle carries k·|queries| rows).
    * Output `(q_id, rank, n_id, ad2)`, ad2 ascending. */
  def adcSearch(spark: SparkSession, queries: DataFrame, codes: DataFrame,
                codebooks: DataFrame, m: Int, subDim: Int, k: Int): DataFrame = {
    require(k > 0, s"adcSearch needs k > 0, got $k")
    requireCodebookShape(codebooks, m, subDim)
    val dtab = distanceTables(queries, codebooks, m, subDim)
    val scored = codes.crossJoin(broadcast(dtab))
      .withColumn("ad2", adcDistance(col("codes"), col("dtab")))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg(k, -col("ad2"), col("id")).as("topk"))
      .select(col("q_id"), posexplode(col("topk.items")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("n_id"),
        (round(-col("col.score"), 4) + 0.0).as("ad2"))
  }
}
