package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: the binary+metadata contracts must be
  * deterministic and length-safe — a real codec swaps in behind the same
  * shapes. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a" * 100), (2L, "xyz" * 40), (3L, "short")
  ).toDF("doc_id", "text")

  test("asMedia produces binary payload with byte size; decode meta is deterministic") {
    val m = Multimodal.asMedia(docs, "text", "image")
    val rows = m.select($"doc_id", $"media_type", $"media_bytes").collect()
    assert(rows.forall(_.getString(1) == "image"))
    assert(rows.map(r => (r.getLong(0), r.getInt(2))).toSet ==
      Set((1L, 100), (2L, 120), (3L, 5)))
    val meta1 = m.withColumn("meta", Multimodal.fakeDecode($"media")).select("meta.*").collect()
    val meta2 = m.withColumn("meta", Multimodal.fakeDecode($"media")).select("meta.*").collect()
    assert(meta1.sameElements(meta2))
    meta1.foreach { r =>
      assert(r.getLong(0) >= 64 && r.getLong(0) < 1088) // width in [64, 1088)
      assert(r.getLong(1) >= 64 && r.getLong(1) < 1088)
      assert(r.getLong(2) >= 0 && r.getLong(2) < 600)
    }
  }

  test("sampleFrames yields n evenly spaced in-bounds frames with stable hashes") {
    val m = Multimodal.asMedia(docs.filter($"doc_id" === 1), "text", "image")
    val frames = Multimodal.sampleFrames(m, n = 4, frameBytes = 32)
      .select($"frame_index", $"frame_offset", $"frame_hash").collect()
    assert(frames.length == 4)
    val offsets = frames.map(_.getInt(1)).sorted
    assert(offsets.head == 0 && offsets.last == 68) // (100-32) spread over 3 gaps
    assert(frames.map(_.getString(2)).distinct.length >= 1)
  }

  test("frameWindows: per-row hop window count, in-bounds slices, empty under one frame") {
    val m = Multimodal.asMedia(docs, "text", "audio")
    val f = Multimodal.frameWindows(m, frameBytes = 64, hop = 32)
      .select($"doc_id", $"frame_index", $"frame_offset", $"energy").collect()
    val byDoc = f.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // doc1: len 100 → floor((100-64)/32)+1 = 2; doc2: len 120 → 2; doc3: len 5 → none
    assert(byDoc == Map(1L -> 2, 2L -> 2))
    assert(f.forall(r => r.getInt(2) == r.getInt(1) * 32))
    assert(f.forall(r => { val e = r.getLong(3); e >= 0 && e < 10000 }))
    // exactly one frame when len == frameBytes (offset 0 only)
    val exact = Multimodal.asMedia(Seq((9L, "z" * 64)).toDF("doc_id", "text"), "text", "audio")
    assert(Multimodal.frameWindows(exact, 64, 32).count() == 1)
  }

  test("decodePartitioned opens the codec once per partition, not per row") {
    val many = (1L to 100L).map(i => (i, s"payload-$i-" + "x" * 64)).toDF("doc_id", "text")
    val m = Multimodal.asMedia(many, "text", "image").repartition(4)
    val acc = spark.sparkContext.longAccumulator("codecInits")
    val out = Multimodal.decodePartitioned(m, () => acc.add(1)).collect()
    assert(out.length == 100)
    assert(acc.value == 4, s"codec must init per partition, got ${acc.value}")
    // deterministic decode across runs
    val again = Multimodal.decodePartitioned(m).collect()
    assert(out.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
    out.foreach(d => assert(d.width >= 64 && d.height >= 64 && d.frames >= 2))
  }

  // Deterministic in-memory fixture images: pure-JVM BufferedImage +
  // ImageIO.write, no files, no external codecs.
  private def fixtureImage(w: Int, h: Int, seed: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17 + seed) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("realDecodeMeta parses actual PNG and BMP headers; garbage rows survive as ok=false") {
    val payloads = Seq(
      (1L, fixtureImage(20, 12, 1, "png")),
      (2L, fixtureImage(7, 33, 2, "bmp")),
      (3L, "not an image at all".getBytes("UTF-8")))
    val df = payloads.toDF("doc_id", "media")
    val got = Multimodal.realDecodeMeta(df).collect().map(d => d.doc_id -> d).toMap
    assert(got(1L) == Multimodal.DecodedImage(1L, 20, 12, "png", ok = true))
    assert(got(2L).width == 7 && got(2L).height == 33 && got(2L).ok)
    assert(got(2L).format.contains("bmp"))
    assert(!got(3L).ok && got(3L).width == -1, "undecodable payload must not fail the job")
  }

  test("realResize decodes actual pixels, halves dimensions, re-encodes valid PNG") {
    // A solid-color image: any resampling filter must preserve the color
    // exactly, so the pixel check is interpolation-independent.
    val solid = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val color = 0x336699
    for (x <- 0 until 16; y <- 0 until 8) solid.setRGB(x, y, color)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solid, "png", bos)
    val df = Seq((1L, bos.toByteArray), (2L, "garbage".getBytes("UTF-8")))
      .toDF("doc_id", "media")

    val got = Multimodal.realResize(df, factor = 2).collect().map(d => d.doc_id -> d).toMap
    assert(got(1L).ok && got(1L).width == 8 && got(1L).height == 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).resized))
    assert(back.getWidth == 8 && back.getHeight == 4, "resized bytes are a real PNG")
    assert((back.getRGB(3, 2) & 0xffffff) == color, "decoded pixel keeps the source color")
    assert(!got(2L).ok, "garbage payload carries through as ok=false")
  }

  test("realDecodeAudio parses actual WAV headers and frames; garbage rows survive as ok=false") {
    // Hand-built WAV independent of syntheticWavs: 12000 Hz mono 16-bit,
    // 5 known samples — the decode must recover the exact header fields,
    // frame count, and peak amplitude from the real RIFF bytes.
    val samples = Seq[Short](100, -500, 300, -299, 0)
    val pcm = java.nio.ByteBuffer.allocate(samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(12000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.size.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray), (2L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val got = Multimodal.realDecodeAudio(df).collect().map(d => d.doc_id -> d).toMap
    assert(got(1L) == Multimodal.DecodedAudio(1L, 12000, 1, 16, 5, 500, ok = true))
    assert(!got(2L).ok && got(2L).sample_rate == -1,
      "undecodable payload must not fail the job")
  }

  test("syntheticWavs round-trips through realDecodeAudio on the generative formula") {
    val ids = Seq(1L, 3L, 7L, 10L, 128L).toDF("doc_id") // 7 is the corrupt id
    val got = Multimodal.realDecodeAudio(Multimodal.syntheticWavs(ids))
      .collect().map(d => d.doc_id -> d).toMap
    assert(!got(7L).ok, "every 7th id is an undecodable payload")
    Seq(1L, 3L, 10L, 128L).foreach { id =>
      val d = got(id)
      val n = 64 + (id % 128).toInt
      val peak = (0 until n).map(i => math.abs((id * 31 + i * 17) % 2003 - 1001)).max
      assert(d.ok && d.sample_rate == 8000 + (id % 3) * 4000 && d.channels == 1 &&
        d.bits == 16 && d.n_samples == n && d.peak_abs == peak,
        s"id $id decoded $d, expected formula values")
    }
  }

  test("r20 syntheticWavs emits bytes IDENTICAL to AudioSystem.write's encoding") {
    // The hand-written 44-byte RIFF/WAVE header must be byte-for-byte what
    // the JDK encoder produced before r20, across all three sample rates
    // and the length range — so the decode side (the real operator
    // surface) sees exactly the same container bytes.
    def jdkWav(id: Long): Array[Byte] = {
      val rate = 8000 + (id % 3).toInt * 4000
      val n = 64 + (id % 128).toInt
      val pcm = java.nio.ByteBuffer.allocate(n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => pcm.putShort((((id * 31 + i * 17) % 2003) - 1001).toShort))
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val ids = Seq(1L, 2L, 3L, 64L, 127L, 128L, 191L) // 3 rates, min/max lengths
    val got = Multimodal.syntheticWavs(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    ids.foreach { id =>
      assert(got(id).sameElements(jdkWav(id)), s"byte mismatch at id $id")
    }
  }

  test("realPhash: identical bytes hash identically; a one-pixel change stays hamming-near; corrupt rows drop") {
    def png(id: Long, tweak: Boolean): Array[Byte] = {
      val (w, h) = (24, 20)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 31 + y * 17 + id.toInt) & 0xffffff))
      if (tweak) img.setRGB(0, 0, 0xffffff) // one-pixel perturbation
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(5L, tweak = false)),
      (2L, png(5L, tweak = false)),   // byte-identical content to 1
      (3L, png(5L, tweak = true)),    // near-dup of 1
      (4L, "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "media")
    val got = Multimodal.realPhash(media).collect()
      .map(p => p.doc_id -> ((p.phash, p.ok))).toMap
    assert(!got(4L)._2 && got(4L)._1.isEmpty)
    assert(got(1L)._2 && got(1L)._1.length == 64 &&
      got(1L)._1.forall(c => c == '0' || c == '1'))
    assert(got(1L)._1 == got(2L)._1, "identical content must collide exactly")
    val hamming = got(1L)._1.zip(got(3L)._1).count { case (a, b) => a != b }
    assert(hamming <= 2, s"one-pixel change moved $hamming bits")
    // hamming-banded near-dup recovery: 4 bands of 16 bits — hamming <= 3
    // pigeonholes at least one untouched band
    def bands(s: String) = (0 until 4).map(i => (i, s.substring(i * 16, i * 16 + 16)))
    assert(bands(got(1L)._1).toSet.intersect(bands(got(3L)._1).toSet).nonEmpty,
      "near-dup pair must share an LSH band")
  }

  test("realPhash: grayscale hashes per the r=g=b formula (ok=true); alpha rejects (ok=false)") {
    // getRGB converts every color model to non-premultiplied sRGB, so a
    // TYPE_BYTE_GRAY pixel of level v reads (v, v, v) and the grayscale
    // formula (299r+587g+114b)/1000 returns v exactly — a same-levels
    // TYPE_INT_RGB render must hash bit-identically (round-11 advice:
    // the former non-RGB guard wrongly dropped grayscale corpora).
    def render(imgType: Int): Array[Byte] = {
      val (w, h) = (24, 20)
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (x <- 0 until w; y <- 0 until h) {
        val v = (x * 31 + y * 17) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, render(java.awt.image.BufferedImage.TYPE_BYTE_GRAY)),
      (2L, render(java.awt.image.BufferedImage.TYPE_INT_RGB)),
      (3L, render(java.awt.image.BufferedImage.TYPE_INT_ARGB))
    ).toDF("doc_id", "media")
    val got = Multimodal.realPhash(media).collect()
      .map(p => p.doc_id -> ((p.phash, p.ok))).toMap
    assert(got(1L)._2, "grayscale image must hash (former guard dropped it)")
    assert(got(1L)._1 == got(2L)._1,
      "grayscale and same-levels RGB renders must hash identically")
    assert(!got(3L)._2 && got(3L)._1.isEmpty,
      "alpha-carrying image stays out of contract")
  }

  test("realAudioFingerprint: identical clips collide; a trimmed copy stays hamming-near; garbage drops") {
    def wav(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(pcm.putShort)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val base = Array.tabulate(160)(i => ((i * 37) % 1800 - 900).toShort)
    val media = Seq(
      (1L, wav(base)),
      (2L, wav(base)),               // byte-identical clip
      (3L, wav(base.dropRight(8))),  // trimmed copy
      (4L, "static noise".getBytes("UTF-8"))
    ).toDF("doc_id", "media")
    val got = Multimodal.realAudioFingerprint(media).collect()
      .map(p => p.doc_id -> ((p.afp, p.ok))).toMap
    assert(!got(4L)._2)
    assert(got(1L)._2 && got(1L)._1.length == 16 &&
      got(1L)._1.forall(c => c == '0' || c == '1'))
    assert(got(1L)._1 == got(2L)._1, "identical clips must collide exactly")
    val hamming = got(1L)._1.zip(got(3L)._1).count { case (a, b) => a != b }
    assert(hamming <= 3, s"trimmed copy moved $hamming bits")
  }

  test("resizeStub halves dimensions and keeps the leading half of the payload") {
    val m = Multimodal.asMedia(docs, "text", "image")
    val r = Multimodal.resizeStub(m, factor = 2)
      .join(m.withColumn("meta", Multimodal.fakeDecode($"media"))
        .select($"doc_id", $"meta.width".as("w0"), $"meta.height".as("h0"),
          $"media_bytes".as("b0")), Seq("doc_id"))
    val rows = r.select($"new_width", $"w0", $"new_height", $"h0",
      $"resized_bytes", $"b0").collect()
    rows.foreach { x =>
      assert(x.getLong(0) == x.getLong(1) / 2)
      assert(x.getLong(2) == x.getLong(3) / 2)
      assert(x.getLong(4) == (x.getInt(5) + 1) / 2)
    }
    // resized payload is a PREFIX of the original: re-hashing the truncated
    // original must reproduce resized_hash
    val check = Multimodal.resizeStub(m, factor = 2)
      .withColumn("prefix_hash",
        sha2(hex($"media".substr(lit(1), ceil(octet_length($"media") / 2).cast("int"))), 256))
      .filter($"resized_hash" =!= $"prefix_hash")
    assert(check.count() == 0)
  }

  test("realAudioFingerprint rejects non-16-bit-mono formats instead of fingerprinting garbage") {
    import javax.sound.sampled._
    // a VALID 8-bit mono PCM WAV: decodes fine, but the 16-bit short
    // reader would span two samples per read — must report ok=false
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val raw = Array.tabulate[Byte](1600)(i => (i % 251).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val media = Seq((1L, bos.toByteArray)).toDF("doc_id", "media")
    val got = Multimodal.realAudioFingerprint(media).collect().head
    assert(!got.ok, "8-bit PCM must be rejected, not misread as 16-bit")
  }

  test("sceneCuts: static clips score zero motion; frame math and thresholds bound cuts") {
    // a 32-byte block repeated 6x: every 64-byte frame at hop 32 is
    // blockblock — identical features, zero motion, zero cuts
    val block = "abcdefghijklmnopqrstuvwxyz012345"
    val media = Multimodal.asMedia(Seq(
      (1L, block * 6),
      (2L, (1 to 8).map(i => s"frame$i").mkString("x" * 20, "x" * 26, "")),
      (3L, "short")
    ).toDF("doc_id", "text"), "text", "video")
    val got = Multimodal.sceneCuts(media, frameBytes = 64, hop = 32)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: len 192 -> (192-64)/32+1 = 5 frames, static
    assert(got(1L) === ((1L, 5L, 0L, 0L)))
    assert(!got.contains(3L), "sub-frame payloads emit no rows")
    // threshold extremes on a varying clip: 0 counts every transition,
    // 10001 counts none; motion is threshold-independent
    val varying = got(2L)
    def cuts(th: Long) = Multimodal.sceneCuts(media, 64, 32, cutThreshold = th)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(cuts(0L)(2L) === varying._2 - 1L, "threshold 0 counts every transition")
    assert(cuts(10001L)(2L) === 0L, "threshold above the feature range counts none")
  }
}
