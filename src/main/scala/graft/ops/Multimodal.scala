package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch transforms.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment) behind a deterministic fake; everything Spark-side —
  * schema, binary encoding, partition-batched transform shape, metadata
  * extraction — is real and tested. In production the stub body is
  * replaced by an actual decoder (e.g. javax.imageio / ffmpeg bindings)
  * without touching the plumbing.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no row-level
  * object churn); `mapPartitions` amortizes decoder init per partition
  * (the Scala analogue of Arrow-batched pandas UDFs); blob columns should
  * be stored in their own parquet column chunk so metadata-only queries
  * never read them (column pruning).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a text corpus as fake media rows: payload = utf-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` over a blob store.
    */
  def toMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** Deterministic stand-in for image decode: "dimensions" derived from
    * the payload bytes. Replace the body with a real decoder in
    * production; the signature (bytes -> (w, h, features)) is the
    * contract.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 1 + (math.abs(payload.length) % 1024)
    val h = 1 + (math.abs(payload.map(_.toInt).sum) % 1024)
    val features = Array.tabulate(8)(i => ((payload.length * (i + 1)) % 997) / 997.0f)
    (w, h, features)
  }

  /** Partition-batched decode + feature extraction: one decoder instance
    * per partition, rows processed as a batch iterator.
    */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, f) = decodeStub(payload)
        Row(id, payload.length.toLong, w, h, f.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize shape: binary -> binary partition-batched transform with
    * refreshed metadata — the remaining multimodal primitive (decode /
    * feature-extract / frame-sample are above). The stub "scales" by
    * keeping every k-th byte where k tracks the area ratio, so output
    * size shrinks roughly like a real downscale and the result is
    * deterministic; a real scaler (imageio / swscale) replaces only the
    * loop body. One transform instance per partition, payloads stay
    * opaque bytes end-to-end.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val rdd = media.select(col("media_id").cast("long"), col("payload"), col("mime"))
      .rdd.mapPartitions { it =>
      // scaler init would happen here, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, _) = decodeStub(payload)
        val k = math.max(1, math.ceil(
          (w.toLong * h) / math.max(1.0, targetW.toLong * targetH)).toInt)
        val scaled = payload.indices.collect { case i if i % k == 0 => payload(i) }.toArray
        Row(id, scaled, r.getString(2), targetW, targetH)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames" and keep every `stride`-th — partition-batched
    * `Array[Byte]` slicing like its siblings (`resize`,
    * `decodeAndFeaturize`); the real sampler swaps in at the same spot.
    * Skipped frames are never materialized (the slice copies only kept
    * bytes) — the earlier base64-string route materialized a 4/3x string
    * of the WHOLE payload per row, GB-scale churn at video payloads.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    // cast pins the row accessor's type: an int-typed media_id source
    // would otherwise ClassCastException at getLong
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd.mapPartitions { it =>
      // demuxer init would happen here, once per partition
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, stride).map { f =>
          Row(id, f, java.util.Arrays.copyOfRange(payload,
            f * frameBytes, math.min((f + 1) * frameBytes, payload.length)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
