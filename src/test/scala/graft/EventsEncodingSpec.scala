package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Testdata-drift regression (round-7 postmortem): the driver has shipped
  * `events.parquet` in two physical `ts` encodings across rounds —
  * ns-precision INT64 (surfaced as LongType under `nanosAsLong`) and
  * standard µs TIMESTAMP with isAdjustedToUTC=false (surfaced as
  * TIMESTAMP_NTZ). A hard-coded repair for one encoding silently killed
  * every events consumer when the other arrived. [[Tables.repairTs]] must
  * therefore produce the SAME UTC instants from any encoding of the same
  * wall-clock data, so the whole catalog is immune to the next flip.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // one day of hourly events, values chosen to be exactly representable
  private val epochMicros: Seq[Long] =
    (0 until 24).map(h => 1700000000000000L + h * 3600L * 1000000L)

  private def writeFixture(dir: String, encode: String): String = {
    val base = epochMicros.toDF("us")
    val df = encode match {
      case "ns_long" => base.select(($"us" * 1000L).as("ts")) // raw INT64 nanos
      case "ntz"     => base.select(
        // timestamp_micros yields TimestampType (an instant); cast to NTZ
        // re-expresses it as the UTC wall clock (session TZ is UTC here),
        // matching how the driver's pandas writer stamps naive timestamps
        timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      case "tz"      => base.select(timestamp_micros($"us").as("ts"))
    }
    val out = s"$dir/$encode"
    df.coalesce(1).write.mode("overwrite").parquet(out)
    out
  }

  describe("Tables.repairTs") {
    it("yields identical UTC instants from INT64-nanos, TIMESTAMP_NTZ and TIMESTAMP encodings") {
      val dir = java.nio.file.Files.createTempDirectory("events-enc").toString
      val got = Seq("ns_long", "ntz", "tz").map { enc =>
        val path = writeFixture(dir, enc)
        val repaired = Tables.repairTs(spark.read.parquet(path))
        repaired.schema("ts").dataType shouldBe TimestampType
        enc -> rowsOf(repaired.select(unix_micros($"ts")))
      }.toMap
      got("ntz") shouldBe got("ns_long")
      got("tz") shouldBe got("ns_long")
      got("ns_long").map(_.head) should contain theSameElementsAs epochMicros
    }

    it("pins NTZ interpretation to UTC regardless of session time zone") {
      val dir = java.nio.file.Files.createTempDirectory("events-enc-tz").toString
      val path = writeFixture(dir, "ntz")
      val prev = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val repaired = Tables.repairTs(spark.read.parquet(path))
        rowsOf(repaired.select(unix_micros($"ts"))).map(_.head) should
          contain theSameElementsAs epochMicros
      } finally spark.conf.set("spark.sql.session.timeZone", prev)
    }

    it("reads the driver's real events.parquet without analysis errors") {
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      ev.schema("ts").dataType shouldBe TimestampType
      // the downstream pattern every broken r7 query used: epoch seconds
      ev.select(unix_timestamp($"ts")).limit(5).count() shouldBe 5
    }
  }
}
