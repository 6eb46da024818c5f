package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  describe("Profile.datasetCard") {
    it("profiles nulls, distincts and numeric ranges per column") {
      val df = Seq(
        (Some(1), Some("a"), Some(2.5)),
        (Some(1), None, Some(-1.0)),
        (None, Some("b"), Some(2.5)))
        .toDF("i", "s", "d")
      val card = Profile.datasetCard(df, Seq("i", "s", "d"))
        .orderBy($"column").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))
      card shouldBe Array(
        ("d", 3L, 0L, 2L, Some(-1.0), Some(2.5)),
        ("i", 3L, 1L, 1L, Some(1.0), Some(1.0)),
        ("s", 3L, 1L, 2L, None, None))
    }

    it("rejects unknown columns and empty selections") {
      val df = Seq((1, "a")).toDF("i", "s")
      an[IllegalArgumentException] should be thrownBy
        Profile.datasetCard(df, Seq("nope"))
      an[IllegalArgumentException] should be thrownBy
        Profile.datasetCard(df, Seq.empty)
    }
  }
}
