package graft

import graft.operators.ExactQuantile

/** Pins the bracketing selection against in-memory sort-and-index on
  * fixtures stressing its seams: duplicate-heavy data (rank mass
  * concentrated in one bucket), extreme quantiles, single-value
  * groups, and ranges far larger than the bucket count (multi-pass
  * narrowing).
  */
class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def reference(xs: Seq[Long], q: Double): Long = {
    val k = math.ceil(q * xs.size).toLong.max(1L).toInt
    xs.sorted.apply(k - 1)
  }

  private def check(groups: Map[String, Seq[Long]], q: Double,
                    buckets: Int = 16): Unit = {
    val df = groups.toSeq.flatMap { case (k, vs) => vs.map((k, _)) }
      .toDF("k", "v")
    val got = ExactQuantile.atQuantile(spark, df, "k", "v", q, buckets)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    groups.foreach { case (key, vs) =>
      val k = math.ceil(q * vs.size).toLong.max(1L)
      got(key) shouldBe ((vs.size.toLong, k, reference(vs, q)))
    }
  }

  describe("ExactQuantile.atQuantile") {
    it("selects exact medians over wide ranges needing multiple passes") {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(i: Int): Long =
        ((md.digest(s"x$i".getBytes)(0) & 0xffL) << 16 |
          (md.digest(s"y$i".getBytes)(1) & 0xffL) << 8 |
          (md.digest(s"z$i".getBytes)(2) & 0xffL))
      check(Map(
        "wide" -> (0 until 500).map(h),        // range ~2^24 ≫ 16 buckets
        "dups" -> (Seq.fill(300)(42L) ++ Seq.fill(299)(7L)),
        "one" -> Seq(99L)), q = 0.5)
    }

    it("handles extreme quantiles and negative values") {
      val xs = (-200L to 200L) ++ Seq.fill(50)(-200L)
      check(Map("g" -> xs), q = 0.01)
      check(Map("g" -> xs), q = 1.0)
    }
  }
}
