package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // labs (left) as-of the latest prior assessment (right), per stay
  val labs = Seq(
    (1L, ts("2024-01-01 10:00:00"), "lactate"),
    (1L, ts("2024-01-01 12:00:00"), "ph"),
    (2L, ts("2024-01-01 09:00:00"), "k")
  ).toDF("stay", "t", "lab")

  val obs = Seq(
    (1L, ts("2024-01-01 09:30:00"), 101L, 36.5),
    (1L, ts("2024-01-01 11:00:00"), 102L, 37.0),
    (3L, ts("2024-01-01 08:00:00"), 103L, 36.0)
  ).toDF("stay", "t", "obs_id", "temp")

  describe("AsOfJoin.asOf") {
    it("attaches the most recent right row at or before each left time") {
      val out = AsOfJoin.asOf(labs, obs, Seq("stay"), "t", "t", tieBreak = "obs_id")
        .select($"stay", $"lab", $"right_obs_id", $"right_temp")
      rowsOf(out) shouldBe rowsOf(Seq(
        (1L, "lactate", Some(101L), Some(36.5)),
        (1L, "ph", Some(102L), Some(37.0)),
        (2L, "k", None, None)
      ).toDF("stay", "lab", "right_obs_id", "right_temp"))
    }

    it("matches an exactly simultaneous right row (inclusive bound)") {
      val simul = Seq((1L, ts("2024-01-01 09:30:00"), "gas")).toDF("stay", "t", "lab")
      val out = AsOfJoin.asOf(simul, obs, Seq("stay"), "t", "t", tieBreak = "obs_id")
      out.select($"right_obs_id").as[Option[Long]].collect().toSeq shouldBe Seq(Some(101L))
    }

    it("breaks right-time ties toward the greatest tieBreak value") {
      val tied = Seq(
        (1L, ts("2024-01-01 09:30:00"), 900L, 1.0),
        (1L, ts("2024-01-01 09:30:00"), 901L, 2.0)
      ).toDF("stay", "t", "obs_id", "temp")
      val out = AsOfJoin.asOf(labs.filter($"lab" === "lactate"), tied,
        Seq("stay"), "t", "t", tieBreak = "obs_id")
      out.select($"right_obs_id").as[Option[Long]].collect().toSeq shouldBe Seq(Some(901L))
    }

    it("nulls matches older than the tolerance") {
      val out = AsOfJoin.asOf(labs, obs, Seq("stay"), "t", "t", tieBreak = "obs_id",
        tolerance = Some("INTERVAL 45 MINUTES"))
        .select($"stay", $"lab", $"right_obs_id")
      // lactate@10:00 ← obs@09:30 (30 min, kept); ph@12:00 ← obs@11:00 (60 min, nulled)
      rowsOf(out) shouldBe rowsOf(Seq(
        (1L, "lactate", Some(101L)),
        (1L, "ph", None),
        (2L, "k", None)
      ).toDF("stay", "lab", "right_obs_id"))
      val tight = AsOfJoin.asOf(labs, obs, Seq("stay"), "t", "t", tieBreak = "obs_id",
        tolerance = Some("INTERVAL 10 MINUTES"))
      tight.filter($"right_obs_id".isNotNull).count() shouldBe 0
    }

    it("rejects a missing key list") {
      an[IllegalArgumentException] should be thrownBy
        AsOfJoin.asOf(labs, obs, Seq.empty, "t", "t", tieBreak = "obs_id")
    }

    it("forward direction attaches the earliest right row at or after") {
      val out = AsOfJoin.asOf(labs, obs, Seq("stay"), "t", "t",
        tieBreak = "obs_id", direction = "forward")
        .select($"stay", $"lab", $"right_obs_id")
      // lactate@10:00 → obs@11:00; ph@12:00 → none after; stay 2 → none
      rowsOf(out) shouldBe rowsOf(Seq(
        (1L, "lactate", Some(102L)),
        (1L, "ph", None),
        (2L, "k", None)
      ).toDF("stay", "lab", "right_obs_id"))
    }

    it("forward tolerance nulls matches beyond leftTime + tolerance") {
      val tight = AsOfJoin.asOf(labs, obs, Seq("stay"), "t", "t",
        tieBreak = "obs_id", direction = "forward",
        tolerance = Some("INTERVAL 30 MINUTES"))
      // lactate@10:00 → obs@11:00 is 60 min out → nulled
      tight.filter($"right_obs_id".isNotNull).count() shouldBe 0
    }

    it("rejects an unknown direction") {
      an[IllegalArgumentException] should be thrownBy
        AsOfJoin.asOf(labs, obs, Seq("stay"), "t", "t",
          tieBreak = "obs_id", direction = "sideways")
    }
  }
}
