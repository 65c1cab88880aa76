package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition.
  *
  * The Spark-side mechanics are real — schema, partition-parallel batch
  * processing via mapPartitions over an iterator (the JVM analogue of a
  * vectorized decode UDF), metadata struct columns. The actual media decode
  * is STUBBED with a deterministic fake (no image/audio codecs in this
  * environment): features derive from the raw bytes, so the pipeline is
  * testable end-to-end and the decode stub is swappable for a real codec.
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

final case class MediaFrame(media_id: Long, frame_idx: Long, frame: Array[Byte])
