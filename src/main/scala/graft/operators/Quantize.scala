package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the memory /
  * storage tier a 100 TB vector corpus needs: each dimension is
  * affinely mapped to an 8-bit code against GLOBAL per-dimension
  * `[lo, hi]` bounds fitted in one corpus pass. An `array<double>`
  * embedding (8 bytes/dim in memory, ~8 on disk) becomes an 0..255
  * code array that parquet dictionary/bit-packs to ~1 byte/dim — an
  * ~8× smaller fast tier, with the full-precision vectors demoted to
  * a cold tier that is only touched to RERANK a bounded candidate
  * list (see [[IvfIndex.searchSq8]]).
  *
  * Everything here is deterministic and engine-replayable:
  * `fitMinMax` uses only order-independent min/max, and the
  * encode/decode maps are fixed-order double arithmetic — so the
  * DuckDB oracle replays codes, reconstructions and cosines
  * bit-for-bit (same IEEE ops in the same order).
  *
  * Reference scope: the reference pipeline has no vector tier at all
  * (it is a pandas linkage script); this extends the engine's
  * similarity layer (SURVEY §2 extensions) the way FAISS-style
  * IVF+SQ does for production ANN serving.
  */
object Quantize {

  /** Per-dimension global bounds over `(id, v: array<double>)` → ONE
    * row `(lo: array<double>, hi: array<double>)`.
    *
    * Shape: posexplode → (dim) min/max partial-aggregates map-side, so
    * the shuffle carries `dims × partitions` rows, never corpus rows;
    * the final collect_list is dims-sized. Min/max are
    * order-independent, so the fit is exact on any partitioning. */
  def fitMinMax(corpus: DataFrame): DataFrame =
    corpus.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(array_sort(collect_list(struct(col("dim"), col("lo")))).as("lp"),
        array_sort(collect_list(struct(col("dim"), col("hi")))).as("hp"))
      .select(expr("transform(lp, p -> p.lo)").as("lo"),
        expr("transform(hp, p -> p.hi)").as("hi"))

  /** SQ8 encode: `code_i = floor((x_i − lo_i) / (hi_i − lo_i) · 255
    * + 0.5)` clamped to [0, 255]; a degenerate dimension (`hi = lo`)
    * encodes as 0. Pure per-row projection (no shuffle — encoding a
    * corpus is one scan), codegen-friendly `transform` with the
    * bounds riding the plan as a broadcast 1-row frame (see callers).
    * The clamp cannot fire mathematically (x ∈ [lo, hi] ⇒ the affine
    * image ∈ [0.5, 255.5] and `(hi−lo)/(hi−lo)` is exactly 1.0 in
    * IEEE) but guards vectors encoded against FOREIGN bounds, e.g. a
    * delta corpus quantized with the base fit. */
  def encodeSq8(v: Column, lo: Column, hi: Column): Column =
    transform(v, (x, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      when(h > l,
        least(lit(255L), greatest(lit(0L),
          floor((x - l) / (h - l) * 255.0 + 0.5))))
        .otherwise(lit(0L)).cast("int")
    })

  /** SQ8 decode: `x̂_i = lo_i + code_i / 255 · (hi_i − lo_i)` — the
    * reconstruction every approximate distance is computed against.
    * Same fixed-order arithmetic as the oracle replay. */
  def decodeSq8(codes: Column, lo: Column, hi: Column): Column =
    transform(codes, (c, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      l + c.cast("double") / 255.0 * (h - l)
    })

  /** Quantize a corpus `(id, v)` against a [[fitMinMax]] frame → `(id,
    * codes: array<int>)`. The 1-row bounds frame is broadcast-joined
    * so the encode stays a shuffle-free scan. */
  def encodeCorpus(corpus: DataFrame, minMax: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(minMax))
      .select(col("id"), encodeSq8(col("v"), col("lo"), col("hi")).as("codes"))
}
