package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition.
  *
  * The Spark-side mechanics are real — schema, partition-parallel batch
  * processing via mapPartitions over an iterator (the JVM analogue of a
  * vectorized decode UDF), metadata struct columns. The IMAGE path is a
  * real codec ([[synthesizePng]] / [[resizeImages]]: `javax.imageio`
  * decode → bilinear scale → PNG encode, pure JVM), and so is the AUDIO
  * path ([[synthesizeWav]] / [[audioFeatures]] / [[resampleAudio]]:
  * `javax.sound.sampled` WAV container + explicit PCM16 DSP). The
  * multi-frame ("video") path is real for animated GIF
  * ([[synthesizeGif]] / [[sampleFramesReal]]: the JDK's sequence writer
  * and `ImageReader` frame extraction) AND for RIFF/AVI video
  * ([[synthesizeAvi]] / [[aviMeta]] / [[transcodeAvi]]: a pure-Scala AVI
  * container writer+parser with uncompressed-DIB and Motion-JPEG codecs
  * — no external library). Inter-frame codecs (H.264 etc.) don't ship
  * with the JDK, so opaque payloads keep the deterministic byte-window
  * stubs ([[resizeStub]] / [[sampleFrames]]), swappable for an external
  * codec behind the same partition-batched API.
  */
object Media {

  /** Attach an opaque binary payload (here: utf-8 bytes of a text column —
    * in production the bytes come off object storage) plus typed metadata.
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "utf-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col(textCol), "utf-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: per-partition batch "decoding" producing deterministic
    * fake features (byte length, additive checksum, fake dimensions).
    * Swap the iterator body for a real codec (load the library once per
    * partition, decode row-by-row); the batching shape stays the same.
    *
    * Typed `Dataset.mapPartitions` rather than `.rdd`: the plan keeps a
    * single Catalyst pipeline (column pruning reaches the scan; no RDD
    * round-trip), which is the Scala analogue of a `mapInPandas` batch UDF.
    */
  def extractFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (codec init) goes here, once per batch
        it.map { case (id, bytes) =>
          var sum = 0L
          bytes.foreach(b => sum = sum * 31 + (b & 0xff))
          MediaFeatures(id, bytes.length.toLong, sum,
            (bytes.length % 640).toLong, ((bytes.length * 7) % 480).toLong)
        }
      }
      .toDF()
  }

  /** STUB resize: binary-in/binary-out per-partition transform — the shape
    * of an image resize batch job. The fake "resize" deterministically
    * samples the payload down to `targetW × targetH` bytes (stride
    * sampling), so output size is exact and content is a pure function of
    * the input; swap the loop body for a real codec resize.
    */
  def resizeStub(payloads: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0 &&
      targetW.toLong * targetH <= Int.MaxValue,
      s"target $targetW x $targetH overflows a byte array")
    val spark = payloads.sparkSession
    import spark.implicits._
    val target = targetW * targetH
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // always exactly target bytes: stride < 1 repeats source bytes
          // (upsample), stride > 1 skips (downsample) — like a real resize
          val out = new Array[Byte](target)
          val stride = bytes.length.toDouble / out.length
          var i = 0
          while (i < out.length) {
            out(i) = if (bytes.isEmpty) 0 else bytes(math.min((i * stride).toInt, bytes.length - 1))
            i += 1
          }
          (id, out, targetW.toLong, targetH.toLong)
        }
      }
      .toDF("media_id", "payload", "width", "height")
  }

  /** REAL image synthesis: one deterministic RGB PNG per row, pixels
    * derived from a text column's bytes, encoded per-partition with
    * `javax.imageio` (pure JVM — PNG/JPEG/BMP/GIF readers and writers ship
    * with the JDK; Java's PNG writer emits no timestamp chunk, so the
    * bytes are a pure function of the pixels). The production analogue is
    * reading image bytes off object storage; this generator exists so the
    * real decode→resize→encode path below is exercisable end-to-end on
    * the tabular test data.
    */
  def synthesizePng(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, h: Int = 16): DataFrame = {
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 22),
      s"source $w x $h unreasonably large")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        it.map { case (id, text) =>
          val bytes = if (text == null) Array[Byte](0) else {
            val b = text.getBytes("UTF-8"); if (b.isEmpty) Array[Byte](0) else b
          }
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = y * w + x
              val r = bytes(i % bytes.length) & 0xff
              val g = bytes((i * 7 + 3) % bytes.length) & 0xff
              val b = bytes((i * 13 + 5) % bytes.length) & 0xff
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("media_id", "payload")
  }

  /** REAL image resize: `javax.imageio` decode → bilinear `Graphics2D`
    * scale → PNG re-encode, the same partition-batched binary→binary API
    * as [[resizeStub]] (which remains for opaque non-image payloads).
    * Codec setup (headless mode, no disk cache) happens once per
    * partition; each row decodes, scales and re-encodes independently —
    * the shape of a thumbnail batch job over object-storage bytes.
    * Undecodable payloads yield a NULL payload with width/height −1
    * (flagged, never silently dropped — the caller decides whether bad
    * media is an error or a filter).
    */
  def resizeImages(
      payloads: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0 &&
      targetW.toLong * targetH <= Int.MaxValue,
      s"target $targetW x $targetH overflows")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          // NULL payloads and plugin RuntimeExceptions must flag the row,
          // not fail the task — same contract as decodePcm16/decodeFrames.
          val img =
            if (bytes == null) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, null: Array[Byte], -1L, -1L)
          else {
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            (id, bos.toByteArray, targetW.toLong, targetH.toLong)
          }
        }
      }
      .toDF("media_id", "payload", "width", "height")
  }

  /** REAL integer-factor upscale by explicit pixel replication (each source
    * pixel becomes an f×f block — a hand-rolled loop, not `Graphics2D`
    * resampling, so the output pixels are EXACTLY the source pixels
    * repeated; the geometry change that preserves content bit-for-bit).
    * The perceptual-hash dedup gate plants these as its resize variants
    * because [[dHash64]] is exactly invariant under pixel replication.
    */
  def scaleNearest(payloads: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1 && factor <= 16, s"unreasonable scale factor $factor")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, null: Array[Byte], -1L, -1L)
          else {
            val w = img.getWidth; val h = img.getHeight
            val out = new java.awt.image.BufferedImage(
              w * factor, h * factor, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                var dy = 0
                while (dy < factor) {
                  var dx = 0
                  while (dx < factor) {
                    out.setRGB(x * factor + dx, y * factor + dy, rgb)
                    dx += 1
                  }
                  dy += 1
                }
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            (id, bos.toByteArray, (w * factor).toLong, (h * factor).toLong)
          }
        }
      }
      .toDF("media_id", "payload", "width", "height")
  }

  /** REAL re-encode: decode and write back through a different container
    * (`bmp` and `png` are lossless — identical pixels, different bytes;
    * `jpg` is lossy). The near-dup family's "same image, different file"
    * variant generator.
    */
  def reencodeImages(payloads: DataFrame, format: String): DataFrame = {
    require(Set("png", "bmp", "jpg").contains(format), s"unsupported $format")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, null: Array[Byte])
          else {
            val src = if (format == "jpg") toBgr(img) else img
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(src, format, bos)
            (id, bos.toByteArray)
          }
        }
      }
      .toDF("media_id", "payload")
  }

  /** 64-bit perceptual difference-hash (dHash — the row-gradient member of
    * Krawetz's aHash/dHash/pHash family, the standard cheap image near-dup
    * fingerprint): decode → integer luma (299·R + 587·G + 114·B, no
    * division) → AREA-EXACT 9×8 box resample computed with integer overlap
    * arithmetic (pixel [x,x+1) contributes `lum · ox · oy` to each cell,
    * where ox/oy are the exact integer overlaps of the pixel with the cell
    * in 1/9th-of-width × 1/8th-of-height units) → bit (y·8 + x) set when
    * cell(x+1, y) > cell(x, y). Every cell's total weight is the same
    * (w·h), so comparing sums ≡ comparing means with zero rounding.
    *
    * Exactness properties the dedup gate exploits: (a) an integer-factor
    * pixel-replication upscale multiplies every cell sum by f² — all 64
    * comparisons unchanged, hamming 0 by construction; (b) lossless
    * re-encodes (PNG/BMP) keep pixels, hence the hash; (c) a global
    * clamp-free brightness shift adds the same amount to every cell —
    * strict comparisons unchanged. Near-dups under mild lossy perturbation
    * land at small hamming, found by [[graft.operators.dedup.SimHash]]'s
    * banded blocking over this hash. Undecodable payloads flag
    * `decode_ok = false` (hash 0), never dropped silently.
    */
  def dHash64(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, 0L, false)
          else (id, dHashOf(img), true)
        }
      }
      .toDF("media_id", "dhash", "decode_ok")
  }

  /** The dHash kernel on a decoded frame — shared by [[dHash64]] (one
    * image per payload) and [[frameDHash64]] (every frame of a clip).
    */
  private def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val gw = 9; val gh = 8
    val sums = Array.ofDim[Long](gh * gw)
    var y = 0
    while (y < h) {
      // cells this pixel row overlaps: cy in [y*gh/h, ((y+1)*gh-1)/h]
      val cy0 = y * gh / h
      val cy1 = math.min(gh - 1, ((y + 1) * gh - 1) / h)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) +
          587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)).toLong
        val cx0 = x * gw / w
        val cx1 = math.min(gw - 1, ((x + 1) * gw - 1) / w)
        var cy = cy0
        while (cy <= cy1) {
          val oy = math.min((cy + 1) * h, (y + 1) * gh) -
            math.max(cy * h, y * gh)
          var cx = cx0
          while (cx <= cx1) {
            val ox = math.min((cx + 1) * w, (x + 1) * gw) -
              math.max(cx * w, x * gw)
            sums(cy * gw + cx) += lum * ox * oy
            cx += 1
          }
          cy += 1
        }
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < 8) {
        if (sums(cy * gw + cx + 1) > sums(cy * gw + cx))
          hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** Per-frame perceptual fingerprints for a video column: decode each
    * AVI clip through the real parser and emit one [[dHashOf]] row per
    * frame, plus the clip's frame count (the denominator the video
    * near-dup verification divides by). Exactness carries over from the
    * image hash: a lossless re-encode ([[transcodeAvi]] DIB→DIB), an fps
    * retime ([[retimeAvi]] — same frames, different header) and a prefix
    * truncation ([[truncateAvi]] — shared frames) all reproduce the base
    * clip's frame hashes bit-for-bit at the shared positions. Undecodable
    * clips flag one `frame_idx = −1, decode_ok = false` row, never
    * silently dropped.
    */
  def frameDHash64(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          decodeAvi(bytes) match {
            case None => Iterator.single((id, -1L, 0L, 0L, false))
            case Some((_, frames)) =>
              val n = frames.length.toLong
              frames.iterator.zipWithIndex.map { case (f, i) =>
                (id, i.toLong, dHashOf(f), n, true)
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "dhash", "n_frames", "decode_ok")
  }

  /** Retime each clip to `newFps` — decode every frame, re-encode with the
    * new rate. Pixels (hence per-frame hashes) are bit-preserved for
    * DIB-coded input; only the stream header changes. The video near-dup
    * family's "same content, different playback speed" variant generator.
    */
  def retimeAvi(payloads: DataFrame, newFps: Int): DataFrame = {
    require(newFps > 0, s"bad fps $newFps")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeAvi(bytes) match {
            case None => (id, null: Array[Byte])
            case Some((m, frames)) =>
              (id, encodeAvi(frames, newFps,
                if (m.compression == 0L) "DIB " else "MJPG"))
          }
        }
      }
      .toDF("media_id", "payload")
  }

  /** Drop the first `nDrop` frames of each clip (decode + re-encode the
    * tail) — the "trimmed intro" near-duplicate variant. The surviving
    * frames are bit-preserved for DIB input but sit at SHIFTED positions
    * (frame i of the trim equals frame i + nDrop of the base), which is
    * exactly the misalignment the offset-tolerant video near-dup exists
    * to recover.
    */
  def trimAviStart(payloads: DataFrame, nDrop: Int): DataFrame = {
    require(nDrop > 0, s"bad drop count $nDrop")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeAvi(bytes) match {
            case None => (id, null: Array[Byte])
            case Some((m, frames)) if frames.length <= nDrop =>
              (id, null: Array[Byte])
            case Some((m, frames)) =>
              (id, encodeAvi(frames.drop(nDrop), m.fps,
                if (m.compression == 0L) "DIB " else "MJPG"))
          }
        }
      }
      .toDF("media_id", "payload")
  }

  /** Keep the first `nKeep` frames of each clip (decode + re-encode the
    * prefix) — the "clipped excerpt" near-duplicate variant. Prefix frames
    * are bit-preserved for DIB input, so their hashes equal the base's.
    */
  def truncateAvi(payloads: DataFrame, nKeep: Int): DataFrame = {
    require(nKeep > 0, s"bad frame count $nKeep")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeAvi(bytes) match {
            case None => (id, null: Array[Byte])
            case Some((m, frames)) =>
              (id, encodeAvi(frames.take(nKeep), m.fps,
                if (m.compression == 0L) "DIB " else "MJPG"))
          }
        }
      }
      .toDF("media_id", "payload")
  }

  /** REAL audio synthesis: one deterministic PCM16 mono WAV per row —
    * a sine tone whose frequency and amplitude envelope derive from a text
    * column's bytes — encoded with `javax.sound.sampled` (the JDK's real
    * WAV writer; header + PCM payload, no timestamps, so bytes are a pure
    * function of the samples). `StrictMath.sin` keeps the samples
    * bit-identical across platforms. Exists so the real decode → resample
    * → re-encode path below is exercisable end-to-end on tabular data.
    */
  def synthesizeWav(
      df: DataFrame, idCol: String, textCol: String,
      sampleRate: Int = 8000, durationMs: Int = 50): DataFrame = {
    require(sampleRate > 0 && durationMs > 0 &&
      sampleRate.toLong * durationMs / 1000 <= (1 << 22),
      s"$durationMs ms at $sampleRate Hz unreasonably long")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = if (text == null || text.isEmpty) Array[Byte](1)
                      else text.getBytes("UTF-8")
          var h = 0L
          bytes.foreach(b => h = h * 31 + (b & 0xff))
          val freq = 200.0 + math.floorMod(h, 600L).toDouble
          val n = sampleRate * durationMs / 1000
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val env = 0.25 + 0.75 * ((bytes(i % bytes.length) & 0xff) / 255.0)
            val s = (StrictMath.sin(2.0 * math.Pi * freq * i / sampleRate) *
              env * 30000.0).toInt
            pcm(2 * i) = (s & 0xff).toByte          // little-endian PCM16
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("media_id", "payload")
  }

  /** REAL audio decode + feature extraction: `javax.sound.sampled` parses
    * the WAV container (format, rate, channels), the PCM16 samples are
    * read out, and per-clip features computed — sample count, duration,
    * RMS and peak amplitude (the audio analogue of [[extractFeatures]],
    * with a real codec). Undecodable payloads are flagged with −1 counts,
    * never silently dropped.
    */
  def audioFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm16(bytes) match {
            case None => AudioFeatures(id, -1L, -1L, -1L, -1.0, -1.0)
            case Some((rate, samples)) =>
              var peak = 0.0; var sumSq = 0.0
              samples.foreach { s =>
                val a = math.abs(s / 32768.0)
                if (a > peak) peak = a
                sumSq += (s / 32768.0) * (s / 32768.0)
              }
              val n = samples.length
              AudioFeatures(id, rate.toLong, n.toLong,
                n.toLong * 1000 / rate,
                if (n == 0) 0.0 else math.sqrt(sumSq / n), peak)
          }
        }
      }
      .toDF()
  }

  /** REAL audio resample: decode the WAV, linearly interpolate the PCM16
    * samples to `targetRate` (the JDK's converters don't rate-convert, so
    * the DSP kernel is explicit — and deterministic), re-encode WAV. Same
    * partition-batched binary→binary API as [[resizeImages]]; undecodable
    * payloads are flagged with a NULL payload and rate −1.
    */
  def resampleAudio(payloads: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate > 0, s"bad target rate $targetRate")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm16(bytes) match {
            case None => (id, null: Array[Byte], -1L, -1L)
            case Some((rate, samples)) =>
              val outN = math.max(
                (samples.length.toLong * targetRate / rate).toInt, 1)
              val out = new Array[Short](outN)
              var i = 0
              while (i < outN) {
                val pos = i.toDouble * rate / targetRate
                val i0 = math.min(pos.toInt, samples.length - 1)
                val i1 = math.min(i0 + 1, samples.length - 1)
                val frac = pos - i0
                out(i) = ((1 - frac) * samples(i0) + frac * samples(i1)).toShort
                i += 1
              }
              val pcm = new Array[Byte](outN * 2)
              i = 0
              while (i < outN) {
                pcm(2 * i) = (out(i) & 0xff).toByte
                pcm(2 * i + 1) = ((out(i) >> 8) & 0xff).toByte
                i += 1
              }
              val fmt = new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                targetRate.toFloat, 16, 1, 2, targetRate.toFloat, false)
              val ais = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, outN.toLong)
              val bos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(
                ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              (id, bos.toByteArray, targetRate.toLong, outN.toLong)
          }
        }
      }
      .toDF("media_id", "payload", "sample_rate", "n_samples")
  }

  /** Phase-invert each clip: decode the PCM16, negate every sample
    * (−32768 clamps to 32767 — the one value whose negation overflows;
    * the synthesized corpora never reach it), re-encode at the same rate.
    * A classic audio near-duplicate transform under which [[aHash64]] is
    * EXACTLY invariant: energies are sums of squares, and squares don't
    * see sign.
    */
  def invertAudio(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm16(bytes) match {
            case None => (id, null: Array[Byte])
            case Some((rate, samples)) =>
              val n = samples.length
              val pcm = new Array[Byte](n * 2)
              var i = 0
              while (i < n) {
                val v = if (samples(i) == Short.MinValue) Short.MaxValue
                        else (-samples(i)).toShort
                pcm(2 * i) = (v & 0xff).toByte
                pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
                i += 1
              }
              val fmt = new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                rate.toFloat, 16, 1, 2, rate.toFloat, false)
              val ais = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
              val bos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(
                ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              (id, bos.toByteArray)
          }
        }
      }
      .toDF("media_id", "payload")
  }

  /** 64-bit acoustic fingerprint (the energy-envelope delta-sign device —
    * the integer-exact analogue of Haitsma–Kalker's sub-band energy-delta
    * hash, collapsed to one band since the corpus is mono PCM): split the
    * clip into 64 equal sample windows (integer boundaries `k·n/64`),
    * window energy = Σ s² as a Long (n ≤ 2²² samples at |s| < 2¹⁵ can't
    * overflow), bit k set when energy(k+1 mod 64) > energy(k).
    *
    * Exactness properties the audio near-dup gate exploits: (a) phase
    * inversion negates every sample — squares, hence energies, hence all
    * 64 comparisons are unchanged; (b) an identity resample
    * ([[resampleAudio]] at the source rate — the interpolation collapses
    * to `out(i) = samples(i)`) re-encodes the exact samples, hash
    * unchanged; (c) exact amplitude doubling scales every energy by 4 —
    * strict comparisons unchanged. Undecodable payloads flag
    * `decode_ok = false` (hash 0), never dropped silently.
    */
  def aHash64(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm16(bytes) match {
            case None => (id, 0L, false)
            case Some((_, samples)) =>
              val n = samples.length
              if (n < 64) (id, 0L, false)
              else {
                val energy = new Array[Long](64)
                var k = 0
                while (k < 64) {
                  val from = k * n / 64
                  val until = (k + 1) * n / 64
                  var e = 0L
                  var i = from
                  while (i < until) {
                    e += samples(i).toLong * samples(i)
                    i += 1
                  }
                  energy(k) = e
                  k += 1
                }
                var hash = 0L
                k = 0
                while (k < 64) {
                  if (energy((k + 1) % 64) > energy(k)) hash |= 1L << k
                  k += 1
                }
                (id, hash, true)
              }
          }
        }
      }
      .toDF("media_id", "ahash", "decode_ok")
  }

  /** WAV container → (sampleRate, PCM16 mono samples); None if the bytes
    * don't decode as 16-bit PCM. Multi-channel input is averaged to mono.
    */
  private def decodePcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        None
      else {
        val raw = ais.readAllBytes()
        val ch = fmt.getChannels
        val le = !fmt.isBigEndian
        val nFrames = raw.length / (2 * ch)
        val out = new Array[Short](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val o = (f * ch + c) * 2
            val s =
              if (le) ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort
              else ((raw(o + 1) & 0xff) | (raw(o) << 8)).toShort
            acc += s
            c += 1
          }
          out(f) = (acc / ch).toShort
          f += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case _: Exception => None }

  /** REAL multi-frame synthesis: one deterministic animated GIF per row —
    * `nFrames` grayscale frames whose pixels derive from a text column's
    * bytes and the frame index — encoded with the JDK's GIF sequence
    * writer (`ImageIO` + per-frame GraphicControlExtension metadata). The
    * JDK has no video codec; an animated GIF is the pure-JVM stand-in
    * with the same shape: a single binary payload containing an ordered
    * frame sequence.
    */
  def synthesizeGif(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, h: Int = 16, nFrames: Int = 6): DataFrame = {
    require(w > 0 && h > 0 && nFrames > 0 && w.toLong * h * nFrames <= (1 << 22),
      s"$nFrames frames of $w x $h unreasonably large")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = if (text == null || text.isEmpty) Array[Byte](1)
                      else text.getBytes("UTF-8")
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val i = (y * w + x) * (f + 1)
                val v = bytes(i % bytes.length) & 0xff
                img.getRaster.setSample(x, y, 0, v)
                x += 1
              }
              y += 1
            }
            img
          }
          (id, encodeAnimatedGif(frames, delayCs = 10))
        }
      }
      .toDF("media_id", "payload")
  }

  /** REAL frame sampling: decode a multi-frame container (RIFF/AVI via
    * the pure-Scala parser below, or animated GIF via the JDK's
    * `ImageReader` — routed on the container magic), keep every
    * `everyN`-th frame, and re-encode each kept frame as a standalone
    * PNG — the real-codec twin of [[sampleFrames]]: the same one→many
    * partition-batched explode, with an actual decoder in the loop.
    * Undecodable payloads yield a single flagged row (frame_idx −1, NULL
    * frame), never a silent drop.
    */
  def sampleFramesReal(payloads: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN > 0)
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val decoded =
            if (isAvi(bytes)) decodeAvi(bytes).map(_._2) else decodeFrames(bytes)
          decoded match {
            case None => Iterator.single((id, -1L, null: Array[Byte], -1L, -1L))
            case Some(frames) =>
              frames.iterator.zipWithIndex
                .filter { case (_, i) => i % everyN == 0 }
                .map { case (img, i) =>
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", bos)
                  (id, i.toLong, bos.toByteArray,
                    img.getWidth.toLong, img.getHeight.toLong)
                }
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame", "width", "height")
  }

  /** Frame sequence → animated GIF bytes via the JDK's sequence writer
    * (one GraphicControlExtension per frame; no timestamps, so output is a
    * pure function of the frames).
    */
  private def encodeAnimatedGif(
      frames: Seq[java.awt.image.BufferedImage], delayCs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val params = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(frames.head), params)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new IIOImage(f, null, meta), params))
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Multi-frame container bytes → decoded frames (None if undecodable). */
  private def decodeFrames(
      bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (bytes.isEmpty || !readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          if (n <= 0) None else Some((0 until n).map(reader.read))
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }

  // ---------------------------------------------------------------------
  // RIFF/AVI video container — pure-Scala writer + parser, two codecs:
  // uncompressed DIB (BI_RGB 24-bit, bottom-up BGR rows — lossless, so a
  // decode→re-encode round trip is bit-identical) and MJPG (each frame an
  // ImageIO-encoded JPEG — the classic Motion-JPEG layout). The container
  // structure (RIFF → LIST hdrl {avih, LIST strl {strh, strf}} → LIST
  // movi {00db/00dc chunks} → idx1) follows the public AVI spec; no
  // external codec library is involved, so the path runs on any executor.
  // ---------------------------------------------------------------------

  /** REAL video synthesis: one deterministic AVI clip per row — `nFrames`
    * RGB frames whose pixels derive from a text column's bytes and the
    * frame index — written into a RIFF/AVI container on executors.
    * `codec` is `"DIB "` (uncompressed 24-bit, lossless) or `"MJPG"`
    * (per-frame JPEG). Headers carry no timestamps, so the payload is a
    * pure function of (text, geometry, codec).
    */
  def synthesizeAvi(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, h: Int = 16, nFrames: Int = 5, fps: Int = 10,
      codec: String = "DIB "): DataFrame = {
    require(w > 0 && h > 0 && nFrames > 0 && fps > 0 &&
      w.toLong * h * nFrames <= (1 << 22),
      s"$nFrames frames of $w x $h unreasonably large")
    require(codec == "DIB " || codec == "MJPG", s"unsupported codec $codec")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val bytes = if (text == null || text.isEmpty) Array[Byte](1)
                      else text.getBytes("UTF-8")
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val i = (y * w + x) * (f + 1)
                val r = bytes(i % bytes.length) & 0xff
                val g = bytes((i * 7 + f + 3) % bytes.length) & 0xff
                val b = bytes((i * 13 + 5) % bytes.length) & 0xff
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            img
          }
          (id, encodeAvi(frames, fps, codec))
        }
      }
      .toDF("media_id", "payload")
  }

  /** Header-only video metadata scan: parse each clip's RIFF structure
    * (avih/strh/strf — no frame decode, so cost is O(header) per row) into
    * typed columns. Unparseable payloads are flagged (−1 dims, NULL
    * codec), never dropped.
    */
  def aviMeta(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseAvi(bytes, decode = false) match {
            case None =>
              (id, -1L, -1L, -1L, -1L, null: String)
            case Some(m) =>
              (id, m.width.toLong, m.height.toLong, m.fps.toLong,
                m.nFramesHdr.toLong, m.codec)
          }
        }
      }
      .toDF("media_id", "width", "height", "fps", "n_frames", "codec")
  }

  /** Transcode each AVI clip to `codec`, preserving geometry and frame
    * rate — decode every frame through the real parser, re-encode through
    * the real writer. Because DIB is lossless and the writer is
    * deterministic, `transcodeAvi(x, "DIB ")` of a DIB-coded clip is
    * bit-identical to the input: the exactness contract the video gate
    * asserts. Undecodable clips yield a NULL payload (flagged).
    */
  def transcodeAvi(payloads: DataFrame, codec: String): DataFrame = {
    require(codec == "DIB " || codec == "MJPG", s"unsupported codec $codec")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeAvi(bytes) match {
            case None => (id, null: Array[Byte])
            case Some((meta, frames)) =>
              (id, encodeAvi(frames, meta.fps, codec))
          }
        }
      }
      .toDF("media_id", "payload")
  }

  /** Frame sequence → AVI container bytes (writer half of the pair). */
  private[multimodal] def encodeAvi(
      frames: Seq[java.awt.image.BufferedImage], fps: Int,
      codec: String): Array[Byte] = {
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val isDib = codec == "DIB "
    val ckId = if (isDib) "00db" else "00dc"
    val frameData = frames.map { f =>
      if (isDib) packDib(f)
      else {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(toBgr(f), "jpeg", bos)
        bos.toByteArray
      }
    }
    val maxFrame = frameData.map(_.length).max
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = { require(s.length == 4); s.getBytes("US-ASCII") }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
      cc(id) ++ le32(data.length.toLong) ++ data ++ pad
    }
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(4L + data.length) ++ cc(typ) ++ data
    val avih = le32(1000000L / fps) ++ le32(maxFrame.toLong * fps) ++
      le32(0) ++ le32(0x10) /* AVIF_HASINDEX */ ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++
      le32(maxFrame.toLong) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("vids") ++ cc(codec) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) /* scale */ ++ le32(fps.toLong) /* rate */ ++
      le32(0) ++ le32(frames.length.toLong) ++ le32(maxFrame.toLong) ++
      le32(0xffffffffL) /* quality */ ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val biCompression = if (isDib) 0L
      else java.lang.Integer.toUnsignedLong(
        java.nio.ByteBuffer.wrap(cc("MJPG"))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    val strf = le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++
      le16(24) ++ le32(biCompression) ++ le32(maxFrame.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChunks = frameData.map(d => chunk(ckId, d))
    val movi = list("movi", moviChunks.flatten.toArray)
    // idx1 offsets are relative to the position of the 'movi' fourcc
    val offsets = moviChunks.scanLeft(4L)((off, c) => off + c.length).init
    val idx1 = chunk("idx1",
      offsets.zip(frameData).flatMap { case (off, d) =>
        cc(ckId) ++ le32(0x10) /* AVIIF_KEYFRAME */ ++ le32(off) ++ le32(d.length.toLong)
      }.toArray)
    val body = cc("AVI ") ++ hdrl ++ movi ++ idx1
    (cc("RIFF") ++ le32(body.length.toLong) ++ body)
  }

  private[multimodal] final case class AviMeta(
      width: Int, height: Int, fps: Int, codec: String, nFramesHdr: Int,
      bitCount: Int, compression: Long, frameChunks: Seq[Array[Byte]])

  private def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte &&
      bytes(8) == 'A'.toByte && bytes(9) == 'V'.toByte &&
      bytes(10) == 'I'.toByte && bytes(11) == ' '.toByte

  /** Parser half: walk the RIFF tree, pull stream geometry from
    * strh/strf and (when `decode`) the raw frame chunks from the movi
    * list. Returns None on any malformed structure — flagging, not
    * throwing, is the caller's contract.
    */
  private def parseAvi(bytes: Array[Byte], decode: Boolean): Option[AviMeta] =
    if (!isAvi(bytes)) None
    else try {
      def u32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      def cc(off: Int): String =
        new String(bytes, off, 4, "US-ASCII")
      var width = -1; var height = -1; var fps = -1; var codec: String = null
      var nFramesHdr = -1; var bitCount = -1; var compression = -1L
      val frameChunks = Seq.newBuilder[Array[Byte]]
      // walk(chunks) over [from, until): RIFF chunk headers are 8 bytes,
      // payloads pad to even length; LISTs nest. The depth cap bounds
      // stack use against crafted deeply-nested containers (real AVIs
      // nest 3 deep) — a hostile payload must flag, never kill the task.
      def walk(from: Int, until: Int, depth: Int): Unit = {
        if (depth > 8) throw new IllegalArgumentException("LIST nesting too deep")
        var p = from
        while (p + 8 <= until) {
          val id = cc(p)
          val size = u32(p + 4)
          val dataAt = p + 8
          if (dataAt + size > until) throw new IllegalArgumentException("truncated chunk")
          if (id == "LIST") {
            val typ = cc(dataAt)
            if (typ == "hdrl" || typ == "strl" || (typ == "movi" && decode))
              walk(dataAt + 4, dataAt + size.toInt, depth + 1)
          } else if (id == "strh") {
            if (cc(dataAt) == "vids") {
              codec = cc(dataAt + 4)
              val scale = u32(dataAt + 20)
              val rate = u32(dataAt + 24)
              if (scale > 0) fps = (rate / scale).toInt
              nFramesHdr = u32(dataAt + 32).toInt
            }
          } else if (id == "strf" && width < 0) {
            width = u32(dataAt + 4).toInt
            height = u32(dataAt + 8).toInt
            bitCount = (u32(dataAt + 14) & 0xffff).toInt
            compression = u32(dataAt + 16)
          } else if (id == "00db" || id == "00dc") {
            frameChunks += java.util.Arrays.copyOfRange(
              bytes, dataAt, dataAt + size.toInt)
          }
          p = dataAt + size.toInt + (size.toInt & 1)
        }
      }
      walk(12, bytes.length, 0)
      // dimension sanity cap (64 Mpixel ≫ any real frame) so a crafted
      // header can't coax unpackDib/ImageIO into a multi-GB allocation
      if (width <= 0 || height <= 0 || fps <= 0 || codec == null ||
        width.toLong * height > (1L << 26)) None
      else Some(AviMeta(width, height, fps, codec, nFramesHdr, bitCount,
        compression, frameChunks.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** AVI bytes → (meta, decoded frames): DIB chunks unpack directly,
    * MJPG chunks go through the JDK's JPEG reader. None if the container
    * or any frame is undecodable.
    */
  private def decodeAvi(
      bytes: Array[Byte]): Option[(AviMeta, Seq[java.awt.image.BufferedImage])] =
    parseAvi(bytes, decode = true).flatMap { m =>
      try {
        if (m.frameChunks.isEmpty) None
        else {
          val frames = m.frameChunks.map { d =>
            if (m.compression == 0L) unpackDib(d, m.width, m.height)
            else {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
              if (img == null) throw new IllegalArgumentException("bad jpeg frame")
              img
            }
          }
          Some((m, frames))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** 24-bit BI_RGB frame packing: bottom-up rows, BGR byte order, each row
    * padded to a 4-byte boundary — the DIB layout the AVI spec mandates.
    */
  private def packDib(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(row + x * 3) = (rgb & 0xff).toByte
        out(row + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte
        out(row + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def unpackDib(
      data: Array[Byte], w: Int, h: Int): java.awt.image.BufferedImage = {
    val stride = (w * 3 + 3) & ~3
    require(data.length >= stride * h, "short DIB frame")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val b = data(row + x * 3) & 0xff
        val g = data(row + x * 3 + 1) & 0xff
        val r = data(row + x * 3 + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** JPEG writers reject some source types (e.g. palettes with alpha);
    * normalize to BGR before encoding.
    */
  private def toBgr(
      img: java.awt.image.BufferedImage): java.awt.image.BufferedImage =
    if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) img
    else {
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = out.createGraphics()
      g.drawImage(img, 0, 0, null)
      g.dispose()
      out
    }

  /** STUB frame sampling: one media row explodes to one row per sampled
    * "frame" (fixed-size byte window, every `everyN`-th) — the shape of a
    * video frame-extraction job: per-partition batch iteration, one→many
    * via iterator flatMap (no driver involvement, no RDD round-trip).
    */
  def sampleFrames(
      payloads: DataFrame, frameBytes: Int = 256, everyN: Int = 2): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = math.max((bytes.length + frameBytes - 1) / frameBytes, 1)
          (0 until nFrames by everyN).iterator.map { f =>
            val from = math.min(f * frameBytes, math.max(bytes.length - 1, 0))
            val until = math.min(from + frameBytes, bytes.length)
            MediaFrame(id, f.toLong, java.util.Arrays.copyOfRange(bytes, from, math.max(until, from)))
          }
        }
      }
      .toDF()
  }
}

final case class MediaFeatures(
    media_id: Long, n_bytes: Long, checksum: Long,
    fake_width: Long, fake_height: Long)

final case class AudioFeatures(
    media_id: Long, sample_rate: Long, n_samples: Long,
    duration_ms: Long, rms: Double, peak: Double)

final case class MediaFrame(media_id: Long, frame_idx: Long, frame: Array[Byte])
