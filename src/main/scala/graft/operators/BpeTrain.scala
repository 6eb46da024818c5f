package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — tokenizer TRAINING (the published
  * byte-pair-encoding subword algorithm: count adjacent symbol pairs
  * over the word-frequency table, merge the most frequent pair
  * everywhere, repeat). The engine already counts BPE-ish tokens at
  * scan time; this is the other half a corpus owner needs — learning
  * the merge table from their own data.
  *
  * Scale shape — the part that matters at 100 TB: the CORPUS is
  * touched exactly once (one scan + one shuffle to build the
  * word-frequency table, which is VOCABULARY-sized, ~10⁵–10⁶ rows no
  * matter how big the corpus). Every merge round then runs on that
  * small table: explode adjacent pairs → hash-aggregate pair counts
  * (map-side combine; pair cardinality ≤ Σ word lengths) → ONE row to
  * the driver (the argmax pair) → a narrow per-word fold applies the
  * merge. k rounds = k tiny shuffles + k driver round-trips of one
  * row — the same iterated-aggregation shape as
  * [[QualityFilters.logisticFit]].
  *
  * Determinism (exact oracle replay): pair counts are integer sums of
  * integer word frequencies (order-independent); the winning pair
  * breaks count ties lexicographically; the merge fold is sequential
  * left-to-right greedy non-overlapping (an "a a a" corpus under merge
  * (a,a) becomes [aa, a], never [a, aa]) — every step is restatable in
  * SQL, so a DuckDB oracle can replay the full merge trajectory with
  * unrolled CTEs and any tie-break or fold divergence flips every
  * later round.
  */
object BpeTrain {

  /** Word-frequency table `(word, freq)` over whitespace tokens of
    * normalized text — the one corpus-sized pass. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextAnalysis.wsTokens(col(textCol)))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Additive refresh of a persisted word-frequency table with a delta
    * corpus's frequencies — INCREMENTAL tokenizer maintenance. Because
    * [[wordFreqs]] is a pure additive group-by,
    * `mergeFreqs(wordFreqs(A), wordFreqs(B)) = wordFreqs(A ∪ B)`
    * EXACTLY (integer sums, order-free), so re-running [[learnMerges]]
    * on the merged table is IDENTICAL to a full retrain on the combined
    * corpus — the equivalence is algebraic, not approximate (gated by
    * q133 against a full-corpus oracle replay). The scale win: the
    * persisted table is VOCABULARY-sized (~10⁵–10⁶ rows regardless of
    * corpus bytes), the delta pass scans only the delta shard, and the
    * merge itself is one vocabulary-sized shuffle — a weekly crawl
    * updates its tokenizer without ever re-reading the base corpus
    * (the q107 store pattern applied to tokenizer state). */
  def mergeFreqs(baseFreqs: DataFrame, deltaFreqs: DataFrame): DataFrame =
    baseFreqs.unionByName(deltaFreqs)
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))

  /** Seed a word's symbol array: per code point (char mode) or per
    * UTF-8 byte as a lowercase hex pair (byte-level mode — fixed
    * 256-symbol base alphabet, so NO character is ever out of
    * vocabulary; the hex rendering is what a SQL oracle can restate
    * via `hex(encode(word))` substrings). */
  private[graft] def seedSyms(w: Column, byteLevel: Boolean): Column =
    if (byteLevel)
      // o.a.s.sql.functions.encode, not this object's BPE encode
      transform(sequence(lit(1), octet_length(w)),
        i => lower(substring(
          hex(org.apache.spark.sql.functions.encode(w, "UTF-8")),
          i * 2 - 1, lit(2))))
    else filter(split(w, ""), ch => ch =!= "")

  /** Left-to-right greedy non-overlapping merge of adjacent pair
    * `(a, b)` in a symbol array, as a pure Catalyst fold. */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, expr("cast(array() as array<string>)"), (acc, x) => {
      val canMerge = size(acc) > 0 &&
        element_at(acc, -1) === lit(a) && x === lit(b)
      when(canMerge,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x)))
    })

  /** ENCODE with a learned merge list — the apply half of the
    * tokenizer loop (train on the corpus, then tokenize the corpus):
    * each whitespace word splits to characters and replays the merges
    * IN LEARNED ORDER, the same greedy left-to-right fold as training.
    * The whole encoder is one chained per-row expression — `merges.k`
    * nested folds inside a `transform` over the word array — so
    * tokenizing 100 TB is a single shuffle-free scan with no model
    * join (the merge list is vocabulary metadata riding the plan as
    * literals, like [[QualityFilters.linearScore]]'s weights). The
    * fold chain itself evaluates interpreted (higher-order functions
    * are CodegenFallback in Spark), which caps per-row speed — fine
    * for metadata-sized merge lists; a production tokenizer with 10⁴+
    * merges would swap the chain for one native Expression doing a
    * dictionary-driven loop, the [[graft.plans.CosineSimilarity]]
    * escalation path.
    *
    * Returns `idCols ++ (n_words, n_subwords)`: the corpus-level
    * compression ratio n_subwords/n_chars is THE quality metric a
    * tokenizer fit is judged by. */
  def encode(df: DataFrame, idCols: Seq[String], textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val ids = idCols.map(col)
    val words = graft.functions.TextAnalysis.wsTokens(col(textCol))
    val encodeWord = (w: Column) =>
      merges.foldLeft(filter(split(w, ""), ch => ch =!= "")) {
        case (syms, (a, b)) => mergePair(syms, a, b)
      }
    df.select(ids :+ transform(words, w => size(encodeWord(w))).as("_wl"): _*)
      .select(ids ++ Seq(
        size(col("_wl")).as("n_words"),
        aggregate(col("_wl"), lit(0L), (acc, x) => acc + x).as("n_subwords")): _*)
  }

  /** [[encode]]'s production fast path: total subword count per row via
    * the native codegen'd kernel ([[graft.plans.BpeSubwordCount]] — one
    * tight JVM loop per row instead of one interpreted lambda frame per
    * symbol per merge; spec-pinned equal to the fold chain). */
  def subwordCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.PlanBridge.columnOf(
      graft.plans.BpeSubwordCount(
        org.apache.spark.sql.graft.PlanBridge.expressionOf(
          graft.functions.TextAnalysis.normalizeText(text)),
        merges))

  /** Deterministic vocabulary for [[encodeIds]]: base symbols (the
    * distinct seed symbols of the word-frequency table) sorted in
    * UNSIGNED UTF-8 BYTE order get ids `0..B-1`; merge `k`'s product
    * `a+b` gets id `B+k-1`, FIRST assignment winning when two merges
    * produce the same string (("a","bc") and ("ab","c") both make
    * "abc"). Byte order, not Java's UTF-16 `compareTo`, because that is
    * the one total order both engines state identically (DuckDB's
    * binary collation IS unsigned-byte order; UTF-16 order diverges for
    * supplementary-plane vs U+E000–U+FFFF chars). The collect is
    * vocabulary-sized (≤ alphabet + merges), driver-scale by design. */
  def buildVocab(freqs: DataFrame, merges: Seq[(String, String)],
                 byteLevel: Boolean = false): Map[String, Int] = {
    // byte mode: the FIXED 256-byte base alphabet (ids 0..255 = the byte
    // value, since hex pairs sort numerically) — the byte-fallback
    // guarantee production tokenizers rely on: any character of any
    // future input decomposes into base symbols, so -1 (OOV) is
    // impossible by construction, corpus-independent
    val base: Array[String] =
      if (byteLevel) Array.tabulate(256)(b => f"$b%02x")
      else freqs
        .select(explode(seedSyms(col("word"), byteLevel)).as("sym"))
        .distinct().collect().map(_.getString(0))
        .sortWith((a, b) => java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.zipWithIndex.foreach { case (s, i) => out(s) = i }
    merges.zipWithIndex.foreach { case ((a, b), k) =>
      val prod = a + b
      if (!out.contains(prod)) out(prod) = base.length + k
    }
    out.toMap
  }

  /** Token-id emission against a learned vocabulary — the native
    * kernel ([[graft.plans.BpeEncodeIds]]): one codegen'd scan, merges
    * and vocab riding the plan as reference objects. Input text is
    * normalized inside, mirroring [[subwordCount]]. */
  def encodeIds(text: Column, merges: Seq[(String, String)],
                vocab: Map[String, Int], byteLevel: Boolean = false): Column =
    org.apache.spark.sql.graft.PlanBridge.columnOf(
      graft.plans.BpeEncodeIds(
        org.apache.spark.sql.graft.PlanBridge.expressionOf(
          graft.functions.TextAnalysis.normalizeText(text)),
        merges, vocab, byteLevel))

  /** Token-id DECODE — the inverse of [[encodeIds]], closing the
    * tokenizer loop: map each id back through the inverted vocabulary
    * and concatenate. Ids are assigned injectively ([[buildVocab]]
    * skips duplicate merge products), so the inverse map is total on
    * every id [[encodeIds]] can emit; byte mode re-assembles the hex
    * pairs into UTF-8 bytes. Word boundaries are not encoded (no
    * space symbol), so the round-trip identity is
    * `decode(encode(text)) = normalized text with spaces removed` —
    * the q131 gate. Pure per-row Catalyst (map literal rides the
    * plan); shuffle-free like the encoder. */
  def decodeIds(ids: Column, vocab: Map[String, Int],
                byteLevel: Boolean = false): Column = {
    val inv = map(vocab.toSeq.flatMap { case (s, i) =>
      Seq(lit(i), lit(s)) }: _*)
    val joined = array_join(transform(ids, id => element_at(inv, id)), "")
    if (byteLevel)
      org.apache.spark.sql.functions.decode(unhex(joined), "UTF-8")
    else joined
  }

  /** [[encodeIds]]'s spec twin as a pure Catalyst fold chain (the
    * [[encode]] shape plus an id lookup): per word, seed symbols →
    * replay merges in learned order → map through the vocab literal.
    * CodegenFallback-slow; exists so the native kernel is pinned
    * against independently-built semantics. */
  private[graft] def encodeIdsFold(text: Column, merges: Seq[(String, String)],
                                   vocab: Map[String, Int],
                                   byteLevel: Boolean): Column = {
    val vocabMap = map(vocab.toSeq.flatMap { case (s, i) =>
      Seq(lit(s), lit(i)) }: _*)
    val words = graft.functions.TextAnalysis.wsTokens(
      graft.functions.TextAnalysis.normalizeText(text))
    val encodeWord = (w: Column) =>
      merges.foldLeft(seedSyms(w, byteLevel)) {
        case (syms, (a, b)) => mergePair(syms, a, b)
      }
    transform(
      flatten(transform(filter(words, w => w =!= ""), encodeWord)),
      sym => coalesce(element_at(vocabMap, sym), lit(-1)))
  }

  /** Learn `merges` BPE merges from a word-frequency table. Returns the
    * merge trajectory `(step, left, right, pair_count)` — step is
    * 1-based; `pair_count` is the winning pair's weighted frequency at
    * the time it won. Stops early if no adjacent pair remains.
    * Delegates to [[learnMergesBatched]] at batch = 1, which is
    * EXACTLY the textbook one-merge-per-scan loop (same count, same
    * (cnt desc, l, r) winner rule, same greedy fold — q124/q125/q133's
    * trajectories are unchanged by the delegation). */
  def learnMerges(spark: SparkSession, freqs: DataFrame,
                  merges: Int, byteLevel: Boolean = false): Seq[(Int, String, String, Long)] =
    learnMergesBatched(spark, freqs, merges, batch = 1, byteLevel)

  /** BATCHED merge learning — the production-vocab-scale variant: at a
    * 50k-symbol vocabulary, one count-scan per merge is 50k Spark jobs;
    * applying the top-`batch` mutually NON-CONFLICTING merges per scan
    * cuts the heavy job count to ~vocab/batch. Per round:
    *
    *  1. ONE pair-count aggregation over the (vocabulary-sized) words
    *     table, materialized;
    *  2. a greedy deterministic selection over that table: walk pairs
    *     in (cnt desc, l, r) order, accept a pair iff none of its
    *     symbols NOR its product string touches any previously
    *     accepted pair's {left, right, product} — the commutation
    *     guard: disjoint merges can neither destroy nor create each
    *     other's occurrences, so applying the accepted batch in rank
    *     order inside one fold chain equals applying them as `batch`
    *     separate rounds over unchanged counts. The selection is ONE
    *     collect of the top 4·batch rows of the MATERIALIZED count
    *     table with the conflict filter run driver-side — one
    *     round-trip per round, falling back to per-accept filtered
    *     re-queries only when that prefix exhausts all-conflicting
    *     (identical trajectory either way; never a words rescan);
    *  3. one chained fold applies the whole batch, one checkpoint.
    *
    * `batch = 1` reduces exactly to the sequential algorithm. With
    * `batch > 1` the trajectory is its own deterministic, replayable
    * rule (the per-round merge lists are emitted in acceptance order);
    * it coincides with the sequential trajectory precisely when each
    * round's sequential argmaxes are pairwise disjoint and no pair
    * created by an earlier merge of the round would have outranked a
    * later one — the q200 fixture pins that equivalence, and
    * `BpeIdsSpec` pins the conflict-skip rule itself. */
  def learnMergesBatched(spark: SparkSession, freqs: DataFrame, merges: Int,
                         batch: Int, byteLevel: Boolean = false
                        ): Seq[(Int, String, String, Long)] = {
    require(merges > 0, s"merges must be positive, got $merges")
    require(batch > 0, s"batch must be positive, got $batch")
    var words = freqs
      .select(seedSyms(col("word"), byteLevel).as("s"),
        col("freq").cast("long").as("freq"))
      .filter(size(col("s")) > 0)
      .localCheckpoint() // the fold below rewrites `s` every round
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val want = math.min(batch, merges - step + 1)
      val pairs = words
        // single-symbol words have no adjacent pairs — and Spark's
        // sequence(1, 0) DESCENDS rather than yielding empty
        .filter(size(col("s")) > 1)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      // batch = 1 keeps the classic single count+argmax job; larger
      // batches materialize the count table once so the selection
      // re-reads it instead of rescanning words
      val pairsM = if (want == 1) pairs else pairs.localCheckpoint()
      val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var blocked = Set.empty[String]
      def conflicts(l: String, r: String): Boolean =
        blocked(l) || blocked(r) || blocked(l + r)
      def accept(l: String, r: String, cnt: Long): Unit = {
        accepted += ((l, r, cnt))
        blocked = blocked + l + r + (l + r)
      }
      // ONE collect of the top 4·want rows in (cnt desc, l, r) order,
      // conflict-filtered DRIVER-side — one round-trip per round
      // instead of one per accepted merge. (cnt, l, r) is a total
      // order over the distinct (l, r) keys, so walking the prefix and
      // skipping conflicts is exactly the repeated filtered-argmax.
      val prefixCap = 4 * want
      val prefix = pairsM
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(prefixCap).collect()
      prefix.iterator
        .takeWhile(_ => accepted.size < want)
        .foreach { row =>
          val (l, r) = (row.getString(0), row.getString(1))
          if (!conflicts(l, r)) accept(l, r, row.getLong(2))
        }
      // fallback (spec-pinned): the prefix exhausted all-conflicting
      // but the table continues past it — resume the per-accept
      // filtered re-query with the same blocked set, an identical
      // trajectory. A prefix shorter than its cap covered the whole
      // table, so there is nothing past it to query.
      var exhausted = prefix.length < prefixCap
      while (accepted.size < want && !exhausted) {
        val cand = pairsM
          .filter(!col("l").isInCollection(blocked) &&
            !col("r").isInCollection(blocked) &&
            !concat(col("l"), col("r")).isInCollection(blocked))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (cand.isEmpty) exhausted = true
        else accept(cand(0).getString(0), cand(0).getString(1),
          cand(0).getLong(2))
      }
      if (accepted.isEmpty) done = true
      else {
        accepted.zipWithIndex.foreach { case ((l, r, cnt), i) =>
          out += ((step + i, l, r, cnt))
        }
        words = words
          .select(accepted.foldLeft(col("s")) {
            case (syms, (l, r, _)) => mergePair(syms, l, r)
          }.as("s"), col("freq"))
          .localCheckpoint() // cut the fold chain between rounds
        step += accepted.size
        // fewer accepted than wanted means every remaining pair
        // conflicts — the next round recounts and continues
      }
    }
    out.toSeq
  }
}
