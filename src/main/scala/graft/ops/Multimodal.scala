package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The Spark-side contract is real — schema, batching, partitioning,
  * deterministic frame sampling. For IMAGES the decode is real too:
  * [[realDecodeMeta]] (header-only metadata) and [[realResize]] (pixel
  * decode → resample → re-encode) run on `javax.imageio`, which ships in
  * the JRE. [[fakeDecode]] remains for the ORACLE-checked queries (DuckDB
  * cannot decode images) and for audio/video, whose codecs this container
  * does not ship; both paths share the same column contract (binary in →
  * struct out), so downstream operators are unchanged whichever decodes.
  */
object Multimodal {

  /** Executor-side, once per JVM: `javax.imageio` defaults to spooling
    * EVERY ImageInputStream/ImageOutputStream through a DISK cache file
    * (`ImageIO.getUseCache` = true), so each in-memory encode/decode paid
    * a temp-file create+write+delete — r20 measured it as roughly half of
    * mm_phash_dedup's per-image cost at the sf1.0 decade. All media here
    * arrives as in-memory byte arrays, so the disk spool buys nothing;
    * MemoryCache vs FileCache streams are a transport choice with
    * identical decode results. Referenced at the head of every ImageIO
    * closure (lazy val: runs once per executor JVM, thread-safe). */
  private object ImageIoSetup {
    lazy val done: Unit = javax.imageio.ImageIO.setUseCache(false)
  }

  /** Wrap a text/raw column as a typed media column: (media binary,
    * media_type, byte size). */
  def asMedia(df: DataFrame, srcCol: String, mediaType: String): DataFrame =
    df.withColumn("media", col(srcCol).cast("binary"))
      .withColumn("media_type", lit(mediaType))
      .withColumn("media_bytes", octet_length(col("media")))

  /** STUB decode: deterministic pseudo width/height/duration derived from
    * the payload hash — stands in for a real image/audio decoder. */
  def fakeDecode(media: Column): Column = {
    // Column `/` is double division — shift instead (1024 = 2^10,
    // 1048576 = 2^20) so every field stays exact int64.
    val h = DedupOps.hash60(media.cast("string"))
    struct(
      (pmod(h, lit(1024L)) + 64).as("width"),
      (pmod(shiftright(h, 10), lit(1024L)) + 64).as("height"),
      pmod(shiftright(h, 20), lit(600L)).as("duration_s"))
  }

  /** [[fakeDecode]] over a whole frame with the payload hash materialized
    * ONCE per row (Generate barrier) — the Column form re-evaluates the
    * sha-256 chain per accessed struct field under CollapseProject. */
  def decodeMeta(df: DataFrame): DataFrame =
    df.select(col("*"),
        explode(array(DedupOps.hash60(col("media").cast("string")))).as("_h"))
      .withColumn("width", pmod(col("_h"), lit(1024L)) + 64)
      .withColumn("height", pmod(shiftright(col("_h"), 10), lit(1024L)) + 64)
      .withColumn("duration_s", pmod(shiftright(col("_h"), 20), lit(600L)))
      .drop("_h")

  /** Deterministic frame sampling: `n` evenly spaced byte-offset "frames"
    * from the binary payload (each frame = a fixed-size slice), the shape a
    * real video pipeline uses (frame index + payload slice per row). */
  def sampleFrames(df: DataFrame, n: Int, frameBytes: Int = 32): DataFrame = {
    val len = octet_length(col("media"))
    val idx = explode(sequence(lit(0), lit(n - 1)))
    df.withColumn("frame_index", idx)
      .withColumn("frame_offset",
        // span 0 when payload == frameBytes: all frames legitimately sit at
        // offset 0 (a floor of 1 would push the last frame out of bounds
        // and duplicate the rest)
        (col("frame_index") * greatest(len - frameBytes, lit(0)) / lit(math.max(n - 1, 1))).cast("int"))
      .filter(col("frame_offset") + frameBytes <= len)
      .withColumn("frame",
        col("media").substr(col("frame_offset") + 1, lit(frameBytes)))
      // hash the HEX of the slice — byte-portable to the DuckDB oracle for
      // any payload (see resizeStub)
      .withColumn("frame_hash", sha2(hex(col("frame")), 256))
  }

  /** STUB resize: halve/scale the pseudo-dimensions and keep the leading
    * `1/factor` of the payload bytes — stands in for a real image resampler
    * behind the same (binary, metadata) → (binary, metadata) contract, so
    * partitioning/schema behavior downstream is the production shape. */
  def resizeStub(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_meta", fakeDecode(col("media")))
      .withColumn("new_width", floor(col("_meta.width") / factor).cast("long"))
      .withColumn("new_height", floor(col("_meta.height") / factor).cast("long"))
      .withColumn("resized",
        col("media").substr(lit(1),
          ceil(octet_length(col("media")) / lit(factor)).cast("int")))
      .withColumn("resized_bytes", octet_length(col("resized")).cast("long"))
      // Fingerprint the HEX of the slice, not the raw bytes: DuckDB's
      // sha256 only accepts VARCHAR, so raw-byte hashing is only portable
      // for ASCII payloads — hex is pure ASCII for ANY bytes in both
      // engines (uppercase in both).
      .withColumn("resized_hash", sha2(hex(col("resized")), 256))
      .drop("_meta")

  /** Feature extraction over frames: stubbed as the portable 60-bit hash of
    * the frame bytes (a real pipeline emits an embedding here). */
  def frameFeatures(frames: DataFrame): DataFrame =
    frames.withColumn("feature", DedupOps.hash60(hex(col("frame"))))

  /** Hop-windowed frames over a binary payload — the STFT-style framing an
    * audio pipeline applies before feature extraction: overlapping
    * `frameBytes`-wide windows every `hop` bytes. Window count is computed
    * PER ROW from the payload length (a fixed cap would silently truncate
    * long payloads — the oracle-mirror rule in CLAUDE.md). The per-frame
    * "energy" is stubbed as the portable hash of the slice mod 10k (a real
    * pipeline computes RMS over decoded samples behind this same
    * binary→rows contract). */
  def frameWindows(df: DataFrame, frameBytes: Int, hop: Int): DataFrame = {
    require(frameBytes > 0 && hop > 0, "frameBytes and hop must be positive")
    val len = octet_length(col("media"))
    // integer window count: floor((len - frame)/hop) + 1 when len >= frame
    val nWin = when(len >= frameBytes,
      floor((len - lit(frameBytes)).cast("double") / hop).cast("int") + 1)
      .otherwise(0)
    df.withColumn("_nwin", nWin)
      // guard the sequence: Spark sequence(0, -1) DESCENDS instead of
      // being empty, so short payloads must take the empty-array branch
      .withColumn("frame_index",
        explode(when(col("_nwin") > 0, sequence(lit(0), col("_nwin") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame_offset", col("frame_index") * hop)
      .withColumn("frame",
        col("media").substr(col("frame_offset") + 1, lit(frameBytes)))
      // hash the HEX of the slice — byte-portable for any payload
      .withColumn("energy", pmod(DedupOps.hash60(hex(col("frame"))), lit(10000L)))
      .drop("_nwin")
  }

  /** Scene-cut detection over the [[frameWindows]] feature stream: a cut
    * is a frame whose feature jumps by ≥ `cutThreshold` from its
    * predecessor — the shot-boundary heuristic every video curation
    * pipeline runs before frame sampling (sample per SHOT, not per
    * uniform stride, or long static scenes dominate the sample). Reports
    * per-video frame count, cut count, and total feature motion
    * (Σ|Δfeature| — a static clip scores ~0, a rapid montage high).
    *
    * The frame feature is [[frameWindows]]'s stub energy (portable-hash
    * derived, so the DuckDB oracle replays cuts exactly); a real decoder
    * plugs RMS/luma into the same contract. One doc-keyed window (lag
    * over frame_index — frames of one video stay on one partition) + a
    * doc-bounded rollup: embarrassingly parallel across videos. */
  def sceneCuts(df: DataFrame, frameBytes: Int, hop: Int,
                cutThreshold: Long = 2500L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_index"))
    frameWindows(df, frameBytes, hop)
      .select(col("doc_id"), col("frame_index"), col("energy"))
      .withColumn("_prev", lag(col("energy"), 1).over(w))
      .withColumn("_delta",
        when(col("_prev").isNotNull, abs(col("energy") - col("_prev")))
          .otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        // the null-prev guard matters at cutThreshold = 0: the first
        // frame's coalesced delta would otherwise count as a cut
        sum(when(col("_prev").isNotNull && col("_delta") >= cutThreshold, 1L)
          .otherwise(0L)).as("n_cuts"),
        sum(col("_delta")).as("motion_sum"))
  }

  /** One decoded media row. */
  final case class DecodedMedia(doc_id: Long, width: Long, height: Long,
      frames: Int)

  /** One synthetic media row. */
  final case class SyntheticMedia(doc_id: Long, media: Array[Byte])

  /** EXECUTOR-SIDE deterministic PNG synthesis keyed on the id column:
    * width = 16 + id % 32, height = 16 + id % 24, pixels an id-seeded
    * gradient, encoded by `ImageIO.write` on the executors. Every
    * `corruptMod`-th id instead carries plain UTF-8 text — a deterministic
    * UNDECODABLE payload, so the ok=false carry-through of
    * [[realDecodeMeta]] is oracle-checkable too. The generative formula IS
    * the recorded truth: the DuckDB oracle for `mm_real_decode` derives the
    * same dimensions arithmetically and never decodes an image — the
    * engine's `javax.imageio` decode must land on the formula's answer. */
  def syntheticImages(df: DataFrame, idCol: String = "doc_id",
      corruptMod: Int = 7)(
      implicit enc: org.apache.spark.sql.Encoder[SyntheticMedia]): DataFrame =
    df.select(col(idCol).cast("long")).mapPartitions { it =>
      ImageIoSetup.done
      it.map { r =>
        val id = r.getLong(0)
        if (corruptMod > 0 && id % corruptMod == 0)
          SyntheticMedia(id, s"corrupt payload $id".getBytes("UTF-8"))
        else {
          val w = 16 + (id % 32).toInt
          val h = 16 + (id % 24).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              img.setRGB(x, y, (x * 31 + y * 17 + id.toInt) & 0xffffff)
              y += 1
            }
            x += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          SyntheticMedia(id, bos.toByteArray)
        }
      }
    }(enc).toDF()

  /** One REAL image-decode result; `ok = false` carries undecodable
    * payloads through instead of failing the job (a 100 TB corpus always
    * contains corrupt media — a throwing decode would kill the stage). */
  final case class DecodedImage(doc_id: Long, width: Int, height: Int,
      format: String, ok: Boolean)

  /** One synthetic/real audio row pair — see [[syntheticWavs]] /
    * [[realDecodeAudio]]. */
  final case class DecodedAudio(doc_id: Long, sample_rate: Long,
      channels: Long, bits: Long, n_samples: Long, peak_abs: Long, ok: Boolean)

  /** EXECUTOR-SIDE deterministic WAV synthesis keyed on the id column:
    * mono 16-bit PCM little-endian, sample rate 8000 + (id%3)·4000,
    * 64 + id%128 samples, sample(i) = (id·31 + i·17) mod 2003 − 1001.
    * Every `corruptMod`-th id carries plain UTF-8 text (undecodable), so
    * ok=false carry-through is oracle-checkable. The generative formula IS
    * the recorded truth: the `mm_real_audio` oracle derives
    * rate/length/peak arithmetically and never decodes audio — the
    * engine's real decode must land on it.
    *
    * r20: the container bytes are written directly (the canonical 44-byte
    * RIFF/WAVE header for 16-bit mono PCM + the LE sample data) instead
    * of through `AudioSystem.write` — the encoder call was ~540 µs/row of
    * provider lookup and stream copying, 2.4× the cost of the DECODE the
    * query exists to exercise. MultimodalSpec pins the emitted bytes
    * IDENTICAL to `AudioSystem.write`'s output across all three rates and
    * the length range, so the decode side (the real operator surface)
    * sees exactly what the JDK encoder would have produced. */
  def syntheticWavs(df: DataFrame, idCol: String = "doc_id",
      corruptMod: Int = 7)(
      implicit enc: org.apache.spark.sql.Encoder[SyntheticMedia]): DataFrame =
    df.select(col(idCol).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        if (corruptMod > 0 && id % corruptMod == 0)
          SyntheticMedia(id, s"corrupt audio $id".getBytes("UTF-8"))
        else {
          val rate = 8000 + (id % 3).toInt * 4000
          val n = 64 + (id % 128).toInt
          val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          writeWavHeader(bb, rate, n)
          var i = 0
          while (i < n) {
            bb.putShort((((id * 31 + i * 17) % 2003) - 1001).toShort)
            i += 1
          }
          SyntheticMedia(id, bb.array())
        }
      }
    }(enc).toDF()

  /** Canonical RIFF/WAVE header for mono 16-bit signed PCM little-endian:
    * RIFF(36 + data) / WAVE / fmt(16: PCM, 1ch, rate, byteRate, block 2,
    * 16 bit) / data(n·2) — byte-for-byte what the JDK's WaveFileWriter
    * emits for this format (spec-pinned). */
  private def writeWavHeader(bb: java.nio.ByteBuffer, rate: Int, n: Int): Unit = {
    val dataLen = n * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
  }

  /** Conservative container-magic pre-check for the audio decode paths:
    * the JDK's three audio file readers (WAVE/AIFF/AU) each REQUIRE their
    * 4-byte magic, so a payload starting with none of them is undecodable
    * by `AudioSystem` by construction. The guard skips the per-row
    * exception-driven SPI scan (~585 µs per corrupt payload, measured) —
    * verdict-identical for the JRE's readers; a deployment adding
    * third-party SPI readers with other magics must extend the list (the
    * litGuard discipline: guard on the ORIGINAL bytes, conservatively). */
  private def looksLikeAudio(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && {
      val b0 = bytes(0); val b1 = bytes(1); val b2 = bytes(2); val b3 = bytes(3)
      (b0 == 'R' && b1 == 'I' && b2 == 'F' && b3 == 'F') ||
      (b0 == 'F' && b1 == 'O' && b2 == 'R' && b3 == 'M') ||
      (b0 == '.' && b1 == 's' && b2 == 'n' && b3 == 'd')
    }

  /** REAL audio decode via `javax.sound.sampled` (in the JRE — no added
    * dependency): WAV header fields from the `AudioFormat`, then the PCM
    * frames actually read and scanned for the peak amplitude — header AND
    * payload are both exercised, per-row, on the executors, in the same
    * `mapPartitions` shape as [[realDecodeMeta]]. Undecodable payloads
    * carry through as ok=false / −1 sentinels, never a thrown stage. */
  def realDecodeAudio(media: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[DecodedAudio]): org.apache.spark.sql.Dataset[DecodedAudio] =
    media.select(col("doc_id").cast("long"), col("media")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (!looksLikeAudio(bytes)) DecodedAudio(id, -1, -1, -1, -1, -1, ok = false)
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val f = ais.getFormat
            val pcm = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(pcm).order(
              if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            var peak = 0L
            while (bb.remaining() >= 2) {
              val v = math.abs(bb.getShort.toLong)
              if (v > peak) peak = v
            }
            DecodedAudio(id, f.getSampleRate.toLong, f.getChannels.toLong,
              f.getSampleSizeInBits.toLong, ais.getFrameLength, peak, ok = true)
          } finally ais.close()
        } catch {
          case _: Exception => DecodedAudio(id, -1, -1, -1, -1, -1, ok = false)
        }
      }
    }(enc)

  /** One audio-fingerprint row — see [[realAudioFingerprint]]. */
  final case class FingerprintedAudio(doc_id: Long, afp: String, ok: Boolean)

  /** REAL-decode audio energy-envelope fingerprint — the audio twin of
    * [[realPhash]]: decode the actual PCM frames, split the sample index
    * range into 16 windows (window of i = i·16 div n, the same exact
    * integer partition as the image block grid), mean |amplitude| per
    * window (integer div), threshold each window against the global mean
    * of the 16 window means, emit 16 '0'/'1' chars. Identical-content
    * clips collide exactly; a clipped/re-padded copy stays hamming-near.
    * Integer-exact end to end, so the oracle replays the fingerprint from
    * the generative WAV formula without decoding audio. Map-only. */
  def realAudioFingerprint(media: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[FingerprintedAudio]): org.apache.spark.sql.Dataset[FingerprintedAudio] =
    media.select(col("doc_id").cast("long"), col("media")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (!looksLikeAudio(bytes)) FingerprintedAudio(id, "", ok = false)
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val f = ais.getFormat
            // the short-reading loop below is ONLY valid for 16-bit
            // single-channel signed PCM; other valid formats (8-bit,
            // A-law/µ-law, stereo) would fingerprint garbage with ok=true
            // (review catch) — they report ok=false explicitly instead
            if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
                f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              FingerprintedAudio(id, "", ok = false)
            else {
            val pcm = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(pcm).order(
              if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = pcm.length / 2
            if (n == 0) FingerprintedAudio(id, "", ok = false)
            else {
              val sums = new Array[Long](16); val cnts = new Array[Long](16)
              var i = 0L
              while (bb.remaining() >= 2) {
                // long index math: Int `i * 16` wraps past ~134M samples
                // (a ~51-minute 44.1 kHz clip) — review catch
                val w = (i * 16L / n).toInt
                sums(w) += math.abs(bb.getShort.toLong); cnts(w) += 1L
                i += 1
              }
              val means = Array.tabulate(16)(w =>
                if (cnts(w) == 0) 0L else sums(w) / cnts(w))
              val gmean = means.sum / 16L
              val sb = new StringBuilder(16)
              means.foreach(m => sb.append(if (m > gmean) '1' else '0'))
              FingerprintedAudio(id, sb.toString, ok = true)
            }
            }
          } finally ais.close()
        } catch {
          case _: Exception => FingerprintedAudio(id, "", ok = false)
        }
      }
    }(enc)

  /** One REAL resize result: re-encoded PNG bytes + new dimensions. */
  final case class ResizedImage(doc_id: Long, width: Int, height: Int,
      resized: Array[Byte], ok: Boolean)

  /** REAL image metadata decode via `javax.imageio` (in the JRE — no added
    * dependency): PNG/BMP/GIF/JPEG headers parsed per row. Header-ONLY —
    * `ImageReader.getWidth/getHeight` read the header, never the pixel
    * planes, which is the right cost model for metadata extraction over a
    * media corpus (pixels are only decoded by [[realResize]] when a
    * transform genuinely needs them). Same `mapPartitions` shape as
    * [[decodePartitioned]]; [[fakeDecode]] remains for the oracle-checked
    * queries (DuckDB cannot decode images). */
  def realDecodeMeta(media: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[DecodedImage]): org.apache.spark.sql.Dataset[DecodedImage] =
    media.select(col("doc_id").cast("long"), col("media")).mapPartitions { it =>
      ImageIoSetup.done
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val reader = readers.next()
              try {
                reader.setInput(iis, true, true)
                DecodedImage(id, reader.getWidth(0), reader.getHeight(0),
                  reader.getFormatName.toLowerCase, ok = true)
              } finally reader.dispose()
            } else DecodedImage(id, -1, -1, "unknown", ok = false)
          } finally iis.close()
        } catch {
          case _: Exception => DecodedImage(id, -1, -1, "error", ok = false)
        }
      }
    }(enc)

  /** One perceptual-hash row — see [[realPhash]]. */
  final case class PhashedImage(doc_id: Long, phash: String, ok: Boolean)

  /** REAL-decode perceptual average-hash (aHash): grayscale every pixel
    * (integer 299/587/114 ppt weights), block-average into an 8×8 grid
    * (block of x = x·8 div w — the exact partition both engines can
    * replay), threshold each cell against the global mean of the 64 cell
    * means, emit the 64 bits as a '0'/'1' string in row-major order. The
    * string form keeps the hash sortable by the driver's comparator and
    * sidesteps the int64 sign bit.
    *
    * Every step is integer-exact arithmetic on the decoded pixels, so for
    * the formula-synthesized fixtures the DuckDB oracle can reproduce the
    * hash WITHOUT decoding images — misread channel order, wrong gamma, or
    * a lossy downscale all land off the formula and fail the gate. The
    * block-average is computed in plain JVM loops per row (a codegen-free
    * map — the image IS the hot loop, round-9 rule a).
    *
    * Scale: map-only over the binary column, embarrassingly parallel;
    * grouping identical hashes afterwards is the first-line image dedup of
    * a multimodal corpus, and hamming-banded near-dup (split the 64 bits
    * into 4 bands of 16 — hamming ≤ 3 guarantees a shared band) reuses the
    * LSH bucket shape. */
  def realPhash(media: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[PhashedImage]): org.apache.spark.sql.Dataset[PhashedImage] =
    media.select(col("doc_id").cast("long"), col("media")).mapPartitions { it =>
      ImageIoSetup.done
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) PhashedImage(id, "", ok = false)
          // getRGB converts EVERY color model to default (non-premultiplied)
          // sRGB, so grayscale images (r=g=b) hash exactly per the integer
          // formula and stay in — only transparency is out of contract (a
          // translucent pixel's RGB alone over-weights it vs any composited
          // rendering; TYPE_INT_RGB-redraw compositing is the upgrade path
          // if alpha corpora matter). Guard alpha only (round-11 advice:
          // the former non-RGB rejection silently dropped real-world
          // grayscale from image dedup).
          else if (img.getColorModel.hasAlpha)
            PhashedImage(id, "", ok = false)
          else {
            val w = img.getWidth; val h = img.getHeight
            val sums = Array.ofDim[Long](8, 8)
            val cnts = Array.ofDim[Long](8, 8)
            var x = 0
            while (x < w) {
              val gx = x * 8 / w
              var y = 0
              while (y < h) {
                val v = img.getRGB(x, y) & 0xffffff
                val gray = (((v >> 16) & 255) * 299L + ((v >> 8) & 255) * 587L +
                  (v & 255) * 114L) / 1000L
                val gy = y * 8 / h
                sums(gy)(gx) += gray; cnts(gy)(gx) += 1L
                y += 1
              }
              x += 1
            }
            val means = Array.tabulate(8, 8)((gy, gx) =>
              if (cnts(gy)(gx) == 0) 0L else sums(gy)(gx) / cnts(gy)(gx))
            val gmean = means.map(_.sum).sum / 64L
            val sb = new StringBuilder(64)
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                sb.append(if (means(gy)(gx) > gmean) '1' else '0'); gx += 1
              }
              gy += 1
            }
            PhashedImage(id, sb.toString, ok = true)
          }
        } catch {
          case _: Exception => PhashedImage(id, "", ok = false)
        }
      }
    }(enc)

  /** REAL pixel decode + resize + re-encode: `ImageIO.read` → scaled draw
    * onto a fresh raster → PNG bytes. Pure raster work — headless-safe, no
    * display required. The (binary, metadata) → (binary, metadata) contract
    * matches [[resizeStub]], so downstream operators are unchanged when the
    * real path swaps in. */
  def realResize(media: DataFrame, factor: Int)(
      implicit enc: org.apache.spark.sql.Encoder[ResizedImage]): org.apache.spark.sql.Dataset[ResizedImage] = {
    require(factor >= 1, "factor must be >= 1")
    media.select(col("doc_id").cast("long"), col("media")).mapPartitions { it =>
      ImageIoSetup.done
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) ResizedImage(id, -1, -1, Array.emptyByteArray, ok = false)
          else {
            val w = math.max(1, img.getWidth / factor)
            val h = math.max(1, img.getHeight / factor)
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedImage(id, w, h, bos.toByteArray, ok = true)
          }
        } catch {
          case _: Exception => ResizedImage(id, -1, -1, Array.emptyByteArray, ok = false)
        }
      }
    }(enc)
  }

  /** The batched-decode execution shape: `mapPartitions` with the (stub)
    * codec opened ONCE per partition and reused for every row in it — the
    * JVM analog of the `mapInPandas` batch contract, where codec/model init
    * is the dominant per-row cost if done naively. `onCodecInit` is a test
    * hook (production passes a real codec factory); rows stream through the
    * iterator, so memory stays O(batch), not O(partition). */
  /** One real-decode scene-cut row — see [[realSceneCuts]]. */
  final case class SceneCutRow(doc_id: Long, n_frames: Long, n_cuts: Long,
      motion_sum: Long, ok: Boolean)

  /** EXECUTOR-SIDE deterministic ANIMATED-GIF synthesis keyed on the id
    * column: 3 + id % 4 full-size frames, each a SOLID gray
    * `(id·37 + f·97) mod 251`, written through the real
    * `javax.imageio` GIF sequence writer (`prepareWriteSequence` /
    * `writeToSequence`). Frames are TYPE_BYTE_INDEXED over an explicit
    * 256-gray palette so the palette round-trips losslessly — GIF's
    * 256-color quantizer never fires and the decoded gray equals the
    * formula exactly (the mm_real_decode discipline: the generative
    * formula IS the recorded truth, so the `mm_real_scenecuts` oracle
    * replays features arithmetically without decoding a byte). Every
    * `corruptMod`-th id carries plain UTF-8 text — deterministic
    * undecodable payload for the ok=false path. */
  def syntheticGifs(df: DataFrame, idCol: String = "doc_id",
      corruptMod: Int = 7)(
      implicit enc: org.apache.spark.sql.Encoder[SyntheticMedia]): DataFrame =
    df.select(col(idCol).cast("long")).mapPartitions { it =>
      ImageIoSetup.done
      val grays = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      it.map { r =>
        val id = r.getLong(0)
        if (corruptMod > 0 && id % corruptMod == 0)
          SyntheticMedia(id, s"corrupt video $id".getBytes("UTF-8"))
        else {
          val w = 8 + (id % 8).toInt
          val h = 8
          val n = 3 + (id % 4).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer =
            javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < n) {
              val g = ((id * 37 + f * 97) % 251).toInt
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
              val raster = img.getRaster
              var x = 0
              while (x < w) {
                var y = 0
                while (y < h) { raster.setSample(x, y, 0, g); y += 1 }
                x += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); ios.close() }
          SyntheticMedia(id, bos.toByteArray)
        }
      }
    }(enc).toDF()

  /** REAL multi-frame decode + scene-cut detection: read every GIF frame
    * through `javax.imageio`, feature each as its integer mean gray
    * (Σ luma div pixels — red channel of getRGB; the synthetic frames are
    * gray so r=g=b), and count predecessor jumps ≥ `cutThreshold` exactly
    * like the stub-feature [[sceneCuts]]. Frames are read SEQUENTIALLY
    * until the stream ends or a frame fails to decode — a truncated tail
    * frame is DROPPED, not fatal (a 100 TB corpus always contains cut-off
    * media; `ok` stays true while at least one frame decoded). Map-only
    * JVM loop per row — the image is the hot loop (round-9 rule a);
    * cross-frame state is a single running (prev, cuts, motion) fold, so
    * memory is one frame, not the clip. */
  def realSceneCuts(media: DataFrame, cutThreshold: Long = 64L)(
      implicit enc: org.apache.spark.sql.Encoder[SceneCutRow]): org.apache.spark.sql.Dataset[SceneCutRow] =
    media.select(col("doc_id").cast("long"), col("media")).mapPartitions { it =>
      ImageIoSetup.done
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) SceneCutRow(id, 0L, 0L, 0L, ok = false)
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, false, false)
                var nFrames = 0L
                var cuts = 0L
                var motion = 0L
                var prev = -1L
                var done = false
                while (!done) {
                  val img =
                    try reader.read(nFrames.toInt)
                    catch { case _: Exception => null }
                  if (img == null) done = true
                  else {
                    val w = img.getWidth
                    val h = img.getHeight
                    var sum = 0L
                    var x = 0
                    while (x < w) {
                      var y = 0
                      while (y < h) {
                        sum += (img.getRGB(x, y) >> 16) & 0xff
                        y += 1
                      }
                      x += 1
                    }
                    val feat = sum / (w.toLong * h)
                    if (prev >= 0) {
                      val d = math.abs(feat - prev)
                      motion += d
                      if (d >= cutThreshold) cuts += 1
                    }
                    prev = feat
                    nFrames += 1
                  }
                }
                SceneCutRow(id, nFrames, cuts, motion, ok = nFrames > 0)
              } finally reader.dispose()
            }
          } finally iis.close()
        } catch {
          case _: Exception => SceneCutRow(id, 0L, 0L, 0L, ok = false)
        }
      }
    }(enc)

  def decodePartitioned(media: DataFrame, onCodecInit: () => Unit = () => ())(
      implicit enc: org.apache.spark.sql.Encoder[DecodedMedia]): org.apache.spark.sql.Dataset[DecodedMedia] = {
    val rows = media.select(col("doc_id").cast("long"), col("media"))
    rows.mapPartitions { it =>
      onCodecInit() // stands in for opening the codec/model handle
      val codecSalt = 7L // per-handle state a real codec would carry
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // stub decode: cheap deterministic pseudo-metadata from the bytes
        val h = bytes.foldLeft(codecSalt)((acc, b) => acc * 31 + (b & 0xff))
        DecodedMedia(id, math.floorMod(h, 1024) + 64,
          math.floorMod(h >> 10, 1024) + 64, bytes.length / 32)
      }
    }(enc)
  }
}
