package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining-style corpora: concatenate documents
  * in a fixed global order and split every `budget` tokens; a document
  * belongs to the chunk where its first token lands.
  *
  * The primitive underneath is a GLOBAL prefix sum, which a naive window
  * (`sum over (order by id)`) computes on ONE partition — the whole
  * corpus through a single task at 100 TB. This implementation is the
  * classic two-pass distributed scan instead:
  *   1. coarse bucket `id div bucketSize`; within-bucket running sums run
  *      in parallel per bucket (bounded partitions);
  *   2. bucket TOTALS (one row per bucket — corpus/bucketSize rows, tiny
  *      by construction) get an exclusive running sum; only this
  *      bucket-level scan is single-partition;
  *   3. broadcast the offsets back and add.
  * Wall-clock is two linear passes + a broadcast join; no stage sees more
  * than `bucketSize` rows in one window partition. The q52 gate proves
  * the two-pass scan equals the naive global window stated by the oracle.
  */
object Packing {

  /** Append `prefixCol` = exclusive prefix sum of `valueCol` in ascending
    * `orderCol` order (sum of all strictly-earlier rows). `orderCol` must
    * be numeric, unique, and NON-NEGATIVE (`div` truncates toward zero,
    * so negative ids would fold into bucket 0 out of order); `bucketSize`
    * bounds per-partition window size. */
  def exclusivePrefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      prefixCol: String,
      bucketSize: Long = 1 << 20): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    // integer div, not `/`: a double roundtrip loses bits past 2^53
    val bucketed = df.withColumn("__b", expr(s"$orderCol div $bucketSize"))
    val inBucket = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val overBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // The cross-bucket offset scan is a GLOBAL window by design: it runs
    // over one row per bucket (n / bucketSize = n/2^20 rows by default —
    // 10^5 rows for 10^11 input rows), so the single partition Spark
    // warns about is bounded metadata, not data. The explicit coalesce(1)
    // acknowledges that shape instead of leaving it to the window's
    // implicit repartition-to-1.
    val offsets = bucketed.groupBy(col("__b"))
      .agg(sum(col(valueCol)).as("__btotal"))
      .coalesce(1)
      .withColumn("__offset",
        coalesce(sum(col("__btotal")).over(overBuckets), lit(0L)))
      .select(col("__b"), col("__offset"))
    bucketed
      .withColumn("__run", sum(col(valueCol)).over(inBucket))
      .join(broadcast(offsets), Seq("__b"))
      .withColumn(prefixCol, col("__offset") + col("__run") - col(valueCol))
      .drop("__b", "__run", "__offset")
  }

  /** Append `chunkCol` = which fixed-`budget` chunk each row starts in
    * when rows are concatenated in `orderCol` order. */
  def packChunks(
      df: DataFrame,
      orderCol: String,
      sizeCol: String,
      budget: Long,
      chunkCol: String = "chunk",
      bucketSize: Long = 1 << 20): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    exclusivePrefixSum(df, orderCol, sizeCol, "__prefix", bucketSize)
      .withColumn(chunkCol, expr(s"__prefix div $budget"))
      .drop("__prefix")
  }

  /** Sliding-window passage chunking — the embedding/RAG-side
    * counterpart of [[packChunks]]: split each document's text into
    * fixed-`size` character windows advancing by `size − overlap`, so
    * consecutive chunks share `overlap` characters and no content is
    * lost at a boundary. Entirely per-row (sequence + explode +
    * substring — narrow, shuffle-free, codegen'd); chunk count is
    * `ceil((len − overlap) / (size − overlap))` with a minimum of one,
    * so a NON-NULL document shorter than `size` still yields its single
    * (shorter) chunk. Documents with NULL text are DROPPED (explode of
    * a null sequence emits no rows) — deliberate: a null document has
    * no passages to embed; run a null-filter report upstream if those
    * rows must be accounted for. Returns
    * `(id, chunk_idx, chunk_text, chunk_len)`. */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
                size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val step = size - overlap
    val n = greatest(
      ceil((length(col("t")) - lit(overlap)).cast("double") / step).cast("long"),
      lit(1L))
    docs.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), n - 1)))
      .select(col("id"), col("chunk_idx"),
        substring_index_safe(col("t"), col("chunk_idx"), step, size).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }

  /** `substring(t, idx·step + 1, size)` as a Column (1-based start). */
  private def substring_index_safe(t: org.apache.spark.sql.Column,
                                   idx: org.apache.spark.sql.Column,
                                   step: Int, size: Int) =
    t.substr((idx * step + 1L).cast("int"), lit(size))

  /** Token-budget bin packing — first-fit-decreasing of variable-length
    * documents into bins of ≤ `capacity` tokens, the training-batch
    * assembly step after chunking: FFD's 11/9·OPT+1 bound is the
    * standard practical answer, and the decreasing order means long
    * docs seed bins that short docs then fill.
    *
    * FFD is inherently sequential, so the distributed form is
    * PARTITION-LOCAL: docs hash into `buckets` deterministic groups
    * ([[Sampling.hashBucket]] on the id — engine-portable md5, NOT
    * partition-id-dependent), each bucket packs independently, and a
    * bin is identified by `(bucket, bin)`. Packing quality is
    * unaffected in expectation (each bucket sees an iid sample of the
    * same length distribution); what is lost vs a global FFD is only
    * cross-bucket consolidation of the last partially-filled bin per
    * bucket — bounded by `buckets` bins total, negligible against
    * `n/capacity` bins. Size `buckets` so a bucket's docs fit one
    * task comfortably (the fold state is the bucket's assignment
    * list).
    *
    * The fold itself is a Catalyst `aggregate` over the bucket's
    * length-desc-sorted doc array: state = assignments so far; per doc,
    * bin loads are recomputed from the state and the doc takes the
    * FIRST bin with room, else opens a new one. O(m²·bins) per bucket
    * — the price of keeping the fold a pure expression the oracle can
    * restate symbol-for-symbol (`list_reduce`), and bounded by
    * bucket sizing. Docs longer than `capacity` are dropped (chunk
    * first — [[chunkText]] exists for exactly that); docs with
    * len ≤ 0 are dropped as unpackable.
    *
    * Returns one row per doc: `(bucket, id, len, bin)` with `bin`
    * 1-based within its bucket. */
  def ffdPack(df: DataFrame, idCol: String, lenCol: String,
              capacity: Long, buckets: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val sorted = df
      .select(col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
      .filter(col("len") > 0 && col("len") <= capacity)
      .withColumn("bucket", Sampling.hashBucket(col("id"), buckets))
      .groupBy(col("bucket"))
      // (-len, id) sorts length-descending with deterministic id ties
      .agg(array_sort(collect_list(struct((-col("len")).as("nl"), col("id"),
        col("len")))).as("ds"))
    val zero = expr(
      "cast(array() as array<struct<id:bigint,len:bigint,bin:bigint>>)")
    val packed = aggregate(col("ds"), zero, (acc, d) => {
      val dLen = d.getField("len")
      val maxBin = coalesce(array_max(transform(acc, s => s.getField("bin"))), lit(0L))
      // load of bin i = Σ len of docs already assigned to it
      val loadOf = (i: Column) =>
        aggregate(filter(acc, s => s.getField("bin") === i), lit(0L),
          (su, s) => su + s.getField("len"))
      // first bin with room; sequence() descends when start > stop, so
      // clamp and re-filter instead of generating 1..0 (try_element_at:
      // the filtered list is legitimately empty when no bin has room)
      val idx = try_element_at(
        filter(sequence(lit(1L), greatest(maxBin, lit(1L))),
          i => i <= maxBin && loadOf(i) + dLen <= lit(capacity)), lit(1))
      val bin = coalesce(idx, maxBin + lit(1L))
      concat(acc, array(struct(d.getField("id").as("id"), dLen.as("len"),
        bin.as("bin"))))
    })
    sorted.select(col("bucket"), explode(packed).as("a"))
      .select(col("bucket"), col("a.id").as("id"), col("a.len").as("len"),
        col("a.bin").as("bin"))
  }

  /** Per-bin utilization rollup over [[ffdPack]] output: `(bucket, bin,
    * n_docs, bin_tokens, util)`. */
  def binUtilization(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("bin_tokens"))
      .withColumn("util", col("bin_tokens").cast("double") / capacity)

  /** Deterministic per-key event-sequence assembly — the "training
    * example from an event log" shape (conversation turns, session
    * traces, user histories): group by `keyCol`, order each group by
    * `(orderCol, rendered row)` — `sort_array` over structs is
    * lexicographic, so the sequence is deterministic under ANY input
    * partitioning or arrival order, ties included — and emit the
    * ordered digest plus span stats.
    *
    * Scale shape: one hash aggregation; a group's events never leave
    * its key, and the collected sequence is bounded by the largest
    * single key — the same contract as any per-key collect (cap or
    * split degenerate keys upstream; [[graft.operators.Curation.domainCap]]
    * is the tool). Returns
    * `(key, n_events, first_ord, last_ord, digest)`. `orderCol` keeps
    * its NATIVE type throughout (struct sort compares timestamps at
    * full precision and `first_ord`/`last_ord` come back in the input
    * type) — casting to long here would silently coarsen a timestamp
    * to whole seconds and reorder same-second events by the rendered
    * string. */
  def assembleSequences(df: DataFrame, keyCol: String, orderCol: String,
                        render: org.apache.spark.sql.Column): DataFrame =
    df.select(col(keyCol), col(orderCol).as("__o"), render.as("__r"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col("__o")).as("first_ord"), max(col("__o")).as("last_ord"),
        md5(array_join(
          transform(sort_array(collect_list(struct(col("__o"), col("__r")))),
            x => x.getField("__r")), "|")).as("digest"))
}
