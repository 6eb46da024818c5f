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

  // real fixtures: encode BufferedImages through the same JDK codecs a
  // production ingest would produce files with — PNG exact, JPEG lossy
  private def encodeImage(fmt: String, w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, bos)
    bos.toByteArray
  }

  describe("extractImageFeatures (real javax.imageio decode)") {
    it("decodes PNG and JPEG bytes to exact dimensions and luminance stats") {
      // solid gray 120: every luma is exactly 120 (0.299+0.587+0.114 = 1)
      val gray = encodeImage("png", 8, 6)((_, _) => (120 << 16) | (120 << 8) | 120)
      // half black / half white 16x4: mean luma 127.5, histogram mass
      // split between the first and last of 16 bins
      val bw = encodeImage("png", 16, 4)((x, _) => if (x < 8) 0 else 0xffffff)
      val jpegGray = encodeImage("jpeg", 10, 10)((_, _) => (120 << 16) | (120 << 8) | 120)
      val corrupt = Array[Byte](1, 2, 3, 4, 5)
      val df = Seq(
        (1L, "image", gray), (2L, "image", bw),
        (3L, "image", jpegGray), (4L, "image", corrupt)
      ).toDF("media_id", "kind", "content")
      val out = Multimodal.extractImageFeatures(df, bins = 16)
        .select($"media_id", $"img_width", $"img_height", $"mean_luma", $"luma_hist")
        .collect().map(r => r.getLong(0) -> r).toMap

      out(1L).getInt(1) shouldBe 8
      out(1L).getInt(2) shouldBe 6
      out(1L).getDouble(3) shouldBe 120.0 +- 1e-9
      // all mass in bin floor(120*16/256) = 7
      out(1L).getSeq[Double](4)(7) shouldBe 1.0 +- 1e-9

      out(2L).getDouble(3) shouldBe 127.5 +- 1e-9
      val hist2 = out(2L).getSeq[Double](4)
      hist2.head shouldBe 0.5 +- 1e-9
      hist2.last shouldBe 0.5 +- 1e-9

      // JPEG is lossy but a solid color survives within a few levels
      out(3L).getInt(1) shouldBe 10
      out(3L).getDouble(3) shouldBe 120.0 +- 3.0

      // undecodable bytes keep the row with null features
      out(4L).isNullAt(1) shouldBe true
      out(4L).isNullAt(3) shouldBe true
    }

    it("decodes WAV audio to exact RMS and zero-crossing rate") {
      // square wave at half amplitude: |x| = 0.5 everywhere → RMS 0.5
      // exactly; blocks of 4 samples per polarity → one crossing every
      // 4th sample boundary
      def wav(samples: Array[Short], channels: Int = 1): Array[Byte] = {
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
        val bytes = new Array[Byte](samples.length * 2)
        samples.zipWithIndex.foreach { case (s, i) =>
          bytes(2 * i) = (s & 0xff).toByte
          bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
        }
        val in = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(in,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val square = Array.tabulate(800)(i =>
        if ((i / 4) % 2 == 0) 16384.toShort else (-16384).toShort)
      val silence = Array.fill(100)(0.toShort)
      // stereo: channel 0 = square, channel 1 = silence (interleaved)
      val stereo = Array.tabulate(400)(i =>
        if (i % 2 == 0) { val f = i / 2
          if ((f / 4) % 2 == 0) 16384.toShort else (-16384).toShort
        } else 0.toShort)
      val df = Seq(
        (1L, "audio", wav(square)),
        (2L, "audio", wav(silence)),
        (3L, "audio", wav(stereo, channels = 2)),
        (4L, "audio", Array[Byte](9, 9, 9))
      ).toDF("media_id", "kind", "content")
      val out = Multimodal.extractAudioFeatures(df)
        .select($"media_id", $"sample_rate", $"n_channels", $"n_frames", $"rms", $"zcr")
        .collect().map(r => r.getLong(0) -> r).toMap

      out(1L).getFloat(1) shouldBe 8000f
      out(1L).getInt(2) shouldBe 1
      out(1L).getLong(3) shouldBe 800L
      out(1L).getDouble(4) shouldBe 0.5 +- 1e-12
      // 800 samples in blocks of 4 → 199 polarity flips over 799 gaps
      out(1L).getDouble(5) shouldBe (199.0 / 799.0) +- 1e-12

      out(2L).getDouble(4) shouldBe 0.0
      out(2L).getDouble(5) shouldBe 0.0

      // stereo analyzes channel 0 only → same RMS as the mono square
      out(3L).getInt(2) shouldBe 2
      out(3L).getLong(3) shouldBe 200L
      out(3L).getDouble(4) shouldBe 0.5 +- 1e-12

      out(4L).isNullAt(1) shouldBe true
      out(4L).isNullAt(4) shouldBe true
    }

    it("histograms always sum to 1 over decodable rows") {
      val imgs = (1L to 5L).map { i =>
        (i, "image", encodeImage("png", 12, 12)((x, y) =>
          ((x * 21 + i.toInt) % 256 << 16) | ((y * 17) % 256 << 8) | ((x * y) % 256)))
      }
      val out = Multimodal.extractImageFeatures(imgs.toDF("media_id", "kind", "content"))
        .select(Fn.aggregate($"luma_hist", lit(0.0), (a, x) => a + x).as("s"))
        .collect()
      all(out.map(_.getDouble(0))) shouldBe 1.0 +- 1e-9
    }
  }

  describe("decodeWavPcmFast (direct RIFF parse, no provider dispatch)") {
    it("matches the provider path bit-for-bit on canonical PCM WAVs") {
      val fixtures = Seq(
        Multimodal.synthWavSquare(4000, 2, n = 120),
        Multimodal.synthWavSquare(16384, 4, n = 800),
        Multimodal.synthWavSquare(32000, 1, n = 77, sampleRate = 44100f))
      fixtures.foreach { bytes =>
        val fast = Multimodal.decodeWavPcmFast(bytes)
        fast.isDefined shouldBe true // canonical WAV must NOT fall back
        fast shouldBe Multimodal.decodeAudioViaProvider(bytes)
      }
    }

    it("declines non-WAV and truncated payloads instead of guessing") {
      Multimodal.decodeWavPcmFast("RIFFxxxxNOPE".getBytes) shouldBe None
      Multimodal.decodeWavPcmFast(Array[Byte](1, 2, 3)) shouldBe None
      // truncated mid-data: analyze the frames present, like the provider
      val whole = Multimodal.synthWavSquare(8000, 2, n = 100)
      val cut = whole.take(whole.length - 10)
      val fast = Multimodal.decodeWavPcmFast(cut)
      fast shouldBe Multimodal.decodeAudioViaProvider(cut)
      fast.map(_._3) shouldBe Some(95L) // 100 frames - 10 bytes / 2
    }

    it("declines a hostile chunk size near Int.MaxValue instead of throwing") {
      // a chunk claiming 0x7FFFFFFF bytes: Int arithmetic would wrap pos
      // negative and index out of bounds; the Long walk just runs off the
      // end and falls back to None
      val b = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(24); b.put("WAVE".getBytes)
      b.put("JUNK".getBytes); b.putInt(Int.MaxValue)
      b.putLong(0L)
      Multimodal.decodeWavPcmFast(b.array()) shouldBe None
      // same with the unsigned-overflow value 0xFFFFFFFF
      val c = b.array().clone()
      c(16) = -1; c(17) = -1; c(18) = -1; c(19) = -1
      Multimodal.decodeWavPcmFast(c) shouldBe None
    }
  }

  describe("MJPEG-AVI video decode (real RIFF walk + JDK JPEG codec)") {
    def grayFrame(g: Int, w: Int = 48, h: Int = 32): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) { var x = 0; while (x < w) { im.setRGB(x, y, rgb); x += 1 }; y += 1 }
      im
    }

    it("synthAviMjpeg round-trips through decodeAviMjpeg exactly") {
      val jp = Seq(70, 140, 210).map(g => Multimodal.encodeJpeg(grayFrame(g), 1.0f))
      val avi = Multimodal.synthAviMjpeg(jp, width = 48, height = 32, fps = 10)
      val out = Multimodal.decodeAviMjpeg(avi).get
      out.width shouldBe 48
      out.height shouldBe 32
      out.usecPerFrame shouldBe 100000L
      out.frames.size shouldBe 3
      // chunk walk must return the exact encoded payloads, in order
      out.frames.zip(jp).foreach { case (a, b) => a should contain theSameElementsInOrderAs b.toSeq }
    }

    it("solid-gray frames at quality 1.0 decode to their level exactly") {
      val levels = Seq(0, 1, 37, 128, 200, 255)
      val jp = levels.map(g => Multimodal.encodeJpeg(grayFrame(g), 1.0f))
      val avi = Multimodal.synthAviMjpeg(jp, 48, 32, fps = 5)
      val media = Seq((1L, avi)).toDF("media_id", "content")
      val row = Multimodal.extractVideoFeatures(media).head()
      row.getAs[Long]("n_frames") shouldBe levels.size.toLong
      row.getAs[Long]("duration_ms") shouldBe 200L * levels.size
      row.getAs[Long]("luma_ck") shouldBe
        levels.zipWithIndex.map { case (g, f) => (f + 1).toLong * g }.sum
    }

    it("keeps rows with nulls for garbage, truncated, and non-AVI payloads") {
      val good = Multimodal.synthAviMjpeg(
        Seq(Multimodal.encodeJpeg(grayFrame(99), 1.0f)), 48, 32, 10)
      val media = Seq(
        (1L, good),
        (2L, Array.fill[Byte](64)(0x42)), // garbage
        (3L, good.take(good.length / 2)), // truncated mid-chunk
        (4L, Multimodal.synthWavSquare(4000, 2, 120)) // RIFF but WAVE
      ).toDF("media_id", "content")
      val out = Multimodal.extractVideoFeatures(media).orderBy($"media_id").collect()
      out.map(_.isNullAt(5)) shouldBe Array(false, true, true, true)
      out(0).getAs[Long]("luma_ck") shouldBe 99L
    }

    it("videoFrameDHash recovers planted per-frame hashes through the lossy codec") {
      // alternating-bit rows encode as two-level (64/192) cell stripes:
      // bit=1 ⇔ 64→192 ascent, bit=0 ⇔ 192→64 descent — a 128-level
      // step no JPEG artifact can invert, so the hash is exact even at
      // sub-maximal quality
      def stripeFrame(startHigh: Boolean): java.awt.image.BufferedImage = {
        val cell = 16
        val im = new java.awt.image.BufferedImage(9 * cell, 8 * cell,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 9) {
            val high = if (startHigh) gx % 2 == 0 else gx % 2 == 1
            val g = if (high) 192 else 64
            val rgb = (g << 16) | (g << 8) | g
            var y = gy * cell
            while (y < (gy + 1) * cell) {
              var x = gx * cell
              while (x < (gx + 1) * cell) { im.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            gx += 1
          }
          gy += 1
        }
        im
      }
      // startHigh=false: cells 64,192,… → bits 10101010₂ read LSB-first
      // from gx=0 ⇒ row byte 0x55; startHigh=true descends first ⇒ 0xAA
      val jp = Seq(stripeFrame(false), stripeFrame(true))
        .map(Multimodal.encodeJpeg(_, 0.9f))
      val avi = Multimodal.synthAviMjpeg(jp, 144, 128, 10)
      val media = Seq((7L, avi)).toDF("media_id", "content")
      val rows = Multimodal.videoFrameDHash(media).orderBy($"frame_idx").collect()
      rows.length shouldBe 2
      rows(0).getAs[Long]("sim_hi") shouldBe 0x55555555L
      rows(0).getAs[Long]("sim_lo") shouldBe 0x55555555L
      rows(1).getAs[Long]("sim_hi") shouldBe 0xAAAAAAAAL
      rows(1).getAs[Long]("sim_lo") shouldBe 0xAAAAAAAAL
    }
  }

  describe("imageDHash (perceptual hash over the real decode path)") {
    it("recovers the grid fixture's row bytes through encode→decode→pool") {
      val rows = Array(0x5A, 0x13, 0xFF, 0x00, 0x81, 0x42, 0x24, 0xE7)
      val df = Seq(
        (1L, Multimodal.synthGridPng(rows)),                       // 2×2 cells
        (2L, Multimodal.synthGridPng(rows, cellW = 3, cellH = 5)), // odd pooling blocks
        (3L, "not an image".getBytes),                             // undecodable
        (4L, Multimodal.synthGrayPng(100, w = 8, h = 6))           // too small for 9×8
      ).toDF("media_id", "content")
      val out = Multimodal.imageDHash(df).collect()
        .map(r => r.getLong(0) -> r).toMap
      val lo = (0 until 4).map(gy => rows(gy).toLong << (8 * gy)).sum
      val hi = (4 until 8).map(gy => rows(gy).toLong << (8 * (gy - 4))).sum
      out(1L).getLong(1) shouldBe hi
      out(1L).getLong(2) shouldBe lo
      // pooling is exact area averaging → cell size cannot change the hash
      out(2L).getLong(1) shouldBe hi
      out(2L).getLong(2) shouldBe lo
      out(3L).isNullAt(1) shouldBe true
      out(4L).isNullAt(1) shouldBe true
    }

    it("pairs a perturbed image with its original and drops a distant one") {
      val base = Array(0x5A, 0x13, 0xFF, 0x00, 0x81, 0x42, 0x24, 0xE7)
      val near = base.clone(); near(0) = base(0) ^ 0x03   // 2 bits → hd 2
      val far = base.clone(); far(7) = base(7) ^ 0xFF     // 8 bits → hd 8
      val media = Seq(
        (10L, Multimodal.synthGridPng(base)),
        (11L, Multimodal.synthGridPng(near)),
        (12L, Multimodal.synthGridPng(far))
      ).toDF("media_id", "content")
      val hashed = Multimodal.imageDHash(media)
        .filter($"sim_hi".isNotNull)
        .select($"media_id".as("id"), $"sim_hi", $"sim_lo")
      val pairs = graft.operators.TextDedup.bandedHammingPairs64(hashed, maxHd = 3)
        .select($"a_id", $"b_id", $"hd").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      pairs shouldBe Map((10L, 11L) -> 2)
    }
  }
}
