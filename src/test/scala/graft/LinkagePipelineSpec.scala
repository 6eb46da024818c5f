package graft

import org.apache.spark.sql.functions._
import graft.cli.LinkagePipeline
import graft.operators.Validation

/** Golden end-to-end test of the E1/E2 reference-parity pipelines over
  * the checked-in domain fixtures (FIXTURES.md §A): every stage's
  * behavior is pinned by hand-derivable expectations. */
class LinkagePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = getClass.getResource("/domain").getPath
  private lazy val e1 = LinkagePipeline.runLinkage(spark, dir)
  private lazy val cohort = e1("cohort")

  describe("E1 linkage") {
    it("repairs keys, dedups fragments, and keeps the cohort unique") {
      // philips: 7 rows; footer dropped; unit 8 row (1005) filtered;
      // 9901→1004 correction merges with 1004; 1001 fragments merge
      val philips = e1("philips")
      Validation.isUnique(philips, Seq("encounterId")) shouldBe true
      philips.count() shouldBe 4 // 1001, 1002, 1003, 1004
      philips.filter($"encounterId" === 1001)
        .head().getAs[Double]("lengthOfStay (mins)") shouldBe 5805.0
    }

    it("merges the corrected 9901 stay into encounter 1004") {
      val p1004 = e1("philips").filter($"encounterId" === 1004).head()
      p1004.getAs[Double]("lengthOfStay (mins)") shouldBe (9080.0 + 2970.0)
    }

    it("links all four eligible stays to ICNARC records") {
      val icustays = e1("icustays")
      icustays.count() shouldBe 4
      // 300003's CIS id 9999 was repaired to 1003 via the WW issue list
      icustays.filter($"ICNARC number" === 300003)
        .head().getAs[Int]("encounterId") shouldBe 1003
    }

    it("derives mortality, outTime fallback, age, bmi, and gender") {
      cohort.count() shouldBe 4
      val byIcnarc = cohort.collect().map(r =>
        r.getAs[Int]("ICNARC number") -> r).toMap
      byIcnarc(300001).getAs[String]("icnarc_in_hospital_mortality") shouldBe "A"
      byIcnarc(300002).getAs[String]("icnarc_in_hospital_mortality") shouldBe "D"
      byIcnarc(300003).getAs[String]("icnarc_in_hospital_mortality") shouldBe "D"
      byIcnarc(300004).getAs[String]("icnarc_in_hospital_mortality") shouldBe null
      // 300003 has no discharge datetime → body-removed fallback
      byIcnarc(300003).getAs[java.sql.Timestamp]("icnarc_outTime") shouldBe
        java.sql.Timestamp.valueOf("2016-02-06 14:00:00")
      byIcnarc(300003).getAs[Double]("icnarc_los_mins") shouldBe 1740.0
      byIcnarc(300001).getAs[Double]("icnarc_bmi") shouldBe (25.88 +- 0.01)
      byIcnarc(300002).getAs[String]("icnarc_gender") shouldBe "Female"
      byIcnarc(300001).getAs[String]("icnarc_gender") shouldBe "Male"
    }

    it("produces the mortality rate table") {
      val rates = e1("mortality_rates").collect()
        .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
      rates shouldBe Map("A" -> 1L, "D" -> 2L, "null" -> 1L)
    }
  }

  private lazy val e2 = LinkagePipeline.runChartevents(spark, dir, cohort)

  describe("E2 chartevents") {

    it("unions both extracts and keeps all cohort events") {
      val ev = e2("chartevents")
      ev.count() shouldBe 11 // 7 ptassess + 4 labresults, all in cohort
      // string-attribute rows surface valueString; junk → null after parse
      ev.filter($"attributeId" === 16240 && $"encounterId" === 1003)
        .head().getAs[java.lang.Double]("value_num") shouldBe null
      ev.filter($"attributeId" === 8590 && $"encounterId" === 1002)
        .head().getAs[Double]("value_num") shouldBe 2.1
    }

    it("labels events through the interventions key") {
      val labels = e2("chartevents").filter($"Variable".isNotNull)
        .select($"Variable").distinct().collect().map(_.getString(0)).toSet
      labels shouldBe Set("Heart Rate", "Non-Invasive BP Mean", "FiO2",
        "Temperature", "Creatinine", "Lactate")
    }

    it("computes completeness against the cohort size") {
      val c = e2("completeness").collect()
        .map(r => r.getString(0) -> r.getAs[Double]("completeness")).toMap
      c("Heart Rate") shouldBe 0.75 // stays 1001, 1002, 1004 of 4
      c("FiO2") shouldBe 0.25
    }

    it("computes per-stay observation stats") {
      val hr1001 = e2("per_stay_stats")
        .filter($"encounterId" === 1001 && $"Variable" === "Heart Rate").head()
      hr1001.getAs[Long]("n_obs") shouldBe 2L
    }
  }
}
