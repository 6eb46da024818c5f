package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => Fn}
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")

  private def shape(s: org.apache.spark.sql.types.StructType) =
    s.map(f => (f.name, f.dataType))

  describe("Multimodal media table") {
    it("matches the declared schema (names and types)") {
      shape(media.schema) shouldBe shape(Multimodal.mediaSchema)
    }
  }

  describe("extractFeatures") {
    it("produces fixed-dim deterministic features per media row") {
      val f1 = Multimodal.extractFeatures(media, dim = 16)
      f1.filter(Fn.size($"features") =!= 16).count() shouldBe 0
      val a = f1.select($"media_id", $"features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      val b = Multimodal.extractFeatures(media, dim = 16)
        .select($"media_id", $"features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      a shouldBe b
      a.values.flatten.exists(_ != 0.0f) shouldBe true
    }
  }

  describe("resizeMeta") {
    it("caps the longest side, preserving content and mime") {
      val out = Multimodal.resizeMeta(media, maxSide = 100)
      out.filter(greatest($"meta.width", $"meta.height") > 100).count() shouldBe 0
      out.filter($"meta.mime" =!= "application/octet-stream").count() shouldBe 0
      shape(out.schema) shouldBe shape(Multimodal.mediaSchema)
    }
  }

  describe("sampleFrames") {
    it("explodes video rows into ceil(duration/step) frame stubs") {
      val frames = Multimodal.sampleFrames(media, everyMs = 500L)
      val vids = media.filter($"kind" === "video")
        .select($"media_id", ceil($"meta.duration_ms" / 500.0).as("expect"))
      val got = frames.groupBy($"media_id").agg(count(lit(1)).as("n"))
      vids.join(got, Seq("media_id"))
        .filter($"n" =!= greatest($"expect", lit(1L))).count() shouldBe 0
      frames.filter(Fn.length($"frame_bytes") === 0).count() shouldBe 0
    }
  }
}
