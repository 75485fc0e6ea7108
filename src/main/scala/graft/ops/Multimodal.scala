package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch transforms.
  *
  * IMAGE decode/resize are REAL: `javax.imageio` ships PNG/BMP/GIF/
  * JPEG/TIFF/WBMP readers in every JVM, so [[decodeImages]] reads true
  * dimensions/bands/pixel sums from the payload bytes and [[resize]]
  * rescales through `Graphics2D` and re-encodes. AUDIO decode is real
  * too: `javax.sound.sampled` ships WAV/AIFF/AU readers, so
  * [[decodeAudio]] reads true rate/channels/bits/frames/sample sums
  * from the bytes. ANIMATION frame-sampling is real as well:
  * [[sampleAnimationFrames]] decodes every stride-th frame of a
  * multi-frame payload (GIF animations in every JVM; single-frame
  * formats decode as 1-frame animations) without ever decoding skipped
  * frames. Payloads no registered reader accepts (true video codecs /
  * unknown) fall back to the deterministic stub, tagged in a `decoder`
  * column — in production that arm is replaced by ffmpeg-style bindings
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

  /** REAL image decode via javax.imageio: (width, height, bands,
    * pixel-sample sum) from the actual payload bytes; None when no
    * registered reader accepts them. PNG/BMP are lossless, so the
    * sample sum equals the sum of the values the encoder was handed —
    * an oracle can recompute it without any image library.
    */
  def decodeImageMeta(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val raster = im.getRaster
      val bands = raster.getNumBands
      var sum = 0L
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          var b = 0
          while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      (im.getWidth, im.getHeight, bands, sum)
    }
  }

  /** Encode a grayscale image through the JVM's real PNG writer. */
  def encodeGrayPng(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "image dimensions must be positive")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pix(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The deterministic gray test pattern oracles recompute in plain
    * arithmetic: `(id * 7 + x * 13 + y * 31) mod 256`.
    */
  def testPattern(id: Long)(x: Int, y: Int): Int =
    ((id * 7 + x * 13L + y * 31L) % 256).toInt

  /** Real PNG payloads from an (id, w, h) frame, pixels =
    * [[testPattern]] — partition-batched generation through the real
    * encoder; stands in for reading a blob store of true images.
    */
  def grayPngTable(dims: DataFrame, idCol: String, wCol: String, hCol: String): DataFrame =
    grayPngTable(dims.withColumn("__pat", col(idCol)), idCol, wCol, hCol, "__pat")

  /** [[grayPngTable]] with the pixel pattern decoupled from the media id
    * (`patternCol` seeds [[testPattern]]), so distinct media rows can
    * carry IDENTICAL image content — the fixture shape perceptual-hash
    * dedup needs.
    */
  def grayPngTable(dims: DataFrame, idCol: String, wCol: String, hCol: String,
                   patternCol: String): DataFrame = {
    val spark = dims.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType)))
    val rdd = dims.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"), col(patternCol).cast("long"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0),
            encodeGrayPng(r.getInt(1), r.getInt(2), testPattern(r.getLong(3))),
            "image/png")
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Perceptual average-hash (aHash) from REAL decoded pixels: the image
    * is pooled onto an 8x8 grid (pixel (x, y) lands in bucket
    * ((y*8) div h, (x*8) div w), band 0) and each bucket's bit is 1 iff
    * its mean sample >= the whole image's mean — compared by
    * cross-multiplication (`sum_b * n_total >= sum_total * n_b`), so the
    * hash is INTEGER-EXACT and an oracle can recompute it in plain
    * arithmetic for synthetic patterns, like the pix_sum contract.
    * Returns the 64-char '0'/'1' string (bucket row-major, the SimHash
    * bit encoding), or None when no reader accepts the payload. Buckets
    * that receive no pixel (w or h < 8) are 0.
    */
  def averageHash64(payload: Array[Byte]): Option[String] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val raster = im.getRaster
      val w = im.getWidth
      val h = im.getHeight
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var tot = 0L
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val idx = by * 8 + x * 8 / w
          val s = raster.getSample(x, y, 0)
          sums(idx) += s
          cnts(idx) += 1
          tot += s
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val bits = new Array[Char](64)
      var i = 0
      while (i < 64) {
        bits(i) = if (cnts(i) > 0 && sums(i) * n >= tot * cnts(i)) '1' else '0'
        i += 1
      }
      new String(bits)
    }
  }

  /** Partition-batched perceptual hashing: (media_id, ahash, decoder) —
    * real aHash for decodable payloads, null hash tagged "stub"
    * otherwise.
    */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", StringType),
      StructField("decoder", StringType)))
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        averageHash64(r.getAs[Array[Byte]](1)) match {
          case Some(hh) => Row(r.getLong(0), hh, "imageio")
          case None     => Row(r.getLong(0), null, "stub")
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Image near-duplicate candidates: perceptual hashes through the SAME
    * pigeonhole chunk-bucket join the text SimHash tier uses
    * ([[Dedup.hammingCandidatesFromBits]]) — visually-close images land
    * in a shared bucket, candidate generation never goes all-pairs.
    * Undecodable payloads are excluded (a stub hash would fabricate
    * similarity).
    */
  def imageNearDupPairs(media: DataFrame, chunks: Int = 4,
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingCandidatesFromBits(
      imageHashes(media).filter(col("decoder") === "imageio")
        .select(col("media_id").as("doc"), col("ahash").as("sig")),
      chunks, maxHamming)

  /** Partition-batched REAL decode: true dimensions/bands/sample-sum for
    * any payload the JVM's image readers accept, the deterministic stub
    * for the rest — tagged by `decoder` so downstream can filter on
    * provenance. One reader pipeline per partition, rows as a batch
    * iterator.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bands", IntegerType),
      StructField("pix_sum", LongType),
      StructField("decoder", StringType)))
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeImageMeta(payload) match {
          case Some((w, h, bands, sum)) =>
            Row(id, payload.length.toLong, w, h, bands, sum, "imageio")
          case None =>
            val (w, h, _) = decodeStub(payload)
            Row(id, payload.length.toLong, w, h, 0, 0L, "stub")
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
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

  /** Resize: binary -> binary partition-batched transform with
    * refreshed metadata. Payloads the JVM's image readers accept go
    * through the REAL path — `Graphics2D.drawImage` bilinear rescale,
    * re-encoded as PNG (`mime` updated accordingly); everything else
    * keeps the deterministic stub (every-k-th-byte sampling tracking the
    * area ratio). One transform instance per partition, payloads stay
    * opaque bytes end-to-end.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
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
        val decoded =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) =>
            val scaled = new java.awt.image.BufferedImage(targetW, targetH, img.getType match {
              case 0 => java.awt.image.BufferedImage.TYPE_INT_ARGB // custom -> safe default
              case t => t
            })
            val g = scaled.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", out)
            Row(id, out.toByteArray, "image/png", targetW, targetH)
          case None =>
            val (w, h, _) = decodeStub(payload)
            val k = math.max(1, math.ceil(
              (w.toLong * h).toDouble / math.max(1.0, (targetW.toLong * targetH).toDouble)).toInt)
            val sampled = payload.indices.collect { case i if i % k == 0 => payload(i) }.toArray
            Row(id, sampled, r.getString(2), targetW, targetH)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio decode via javax.sound.sampled: sample rate, channels,
    * bit depth, frame count and the PCM16 sample sum from the actual
    * payload bytes; None when the JVM's audio readers reject them. WAV
    * PCM is lossless, so the sample sum equals the sum of the values the
    * encoder was handed — an oracle recomputes it in pure arithmetic,
    * exactly the [[decodeImageMeta]] posture for images.
    */
  def decodeAudioMeta(payload: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    Option(in).map { ais =>
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      var sum = 0L
      if (fmt.getSampleSizeInBits == 16) {
        var i = 0
        while (i + 1 < bytes.length) {
          val lo = bytes(i) & 0xff
          val hi = bytes(i + 1).toInt
          sum += (if (fmt.isBigEndian) ((bytes(i).toInt << 8) | (bytes(i + 1) & 0xff)).toShort
                  else ((hi << 8) | lo).toShort).toLong
          i += 2
        }
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits,
        bytes.length.toLong / math.max(1, fmt.getFrameSize), sum)
    }
  }

  /** Encode mono PCM16 samples through the JVM's real WAV writer. */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sample rate must be positive")
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The deterministic PCM16 test tone oracles recompute in plain
    * arithmetic: `((id * 11 + i * 17) mod 65536) - 32768`.
    */
  def testTone(id: Long)(i: Int): Short =
    (((id * 11 + i * 17L) % 65536) - 32768).toShort

  /** Real WAV payloads from an (id, rate, n) frame, samples =
    * [[testTone]] — partition-batched through the real encoder; the
    * audio twin of [[grayPngTable]].
    */
  def wavTable(spec: DataFrame, idCol: String, rateCol: String, nCol: String): DataFrame =
    wavTable(spec.withColumn("__tone", col(idCol)), idCol, rateCol, nCol, "__tone")

  /** [[wavTable]] with the tone seed decoupled from the media id, so
    * distinct media rows can carry identical audio content (the
    * fingerprint-dedup fixture shape, like the grayPngTable overload).
    */
  def wavTable(spec: DataFrame, idCol: String, rateCol: String, nCol: String,
               toneCol: String): DataFrame = {
    val spark = spec.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType)))
    val rdd = spec.select(col(idCol).cast("long"), col(rateCol).cast("int"),
        col(nCol).cast("int"), col(toneCol).cast("long"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val wav = encodePcm16Wav(r.getInt(1),
            Array.tabulate(r.getInt(2))(testTone(r.getLong(3))))
          Row(r.getLong(0), wav, "audio/wav")
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Energy-envelope audio fingerprint — the WAV twin of
    * [[averageHash64]]: PCM16 samples pool onto 64 time windows (sample
    * i lands in window (i*64) div n), each window's bit is 1 iff its
    * mean ABSOLUTE amplitude >= the whole clip's mean, compared by
    * integer cross-multiplication — so the 64 bits are exact and an
    * oracle recomputes them in plain arithmetic for synthetic tones.
    * Returns None when no audio reader accepts the payload or the
    * stream isn't PCM16; windows with no sample (n < 64) are 0.
    */
  def audioHash64(payload: Array[Byte]): Option[String] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    Option(in).filter(_.getFormat.getSampleSizeInBits == 16).map { ais =>
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var tot = 0L
      var i = 0
      while (i < n) {
        val s =
          if (fmt.isBigEndian) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)).toShort
          else (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort
        val e = math.abs(s.toLong)
        val idx = (i.toLong * 64 / n).toInt
        sums(idx) += e
        cnts(idx) += 1
        tot += e
        i += 1
      }
      val bits = new Array[Char](64)
      var b = 0
      while (b < 64) {
        bits(b) = if (cnts(b) > 0 && sums(b) * n >= tot * cnts(b)) '1' else '0'
        b += 1
      }
      new String(bits)
    }
  }

  /** Partition-batched audio fingerprinting: (media_id, ahash, decoder). */
  def audioHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", StringType),
      StructField("decoder", StringType)))
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        audioHash64(r.getAs[Array[Byte]](1)) match {
          case Some(hh) => Row(r.getLong(0), hh, "javasound")
          case None     => Row(r.getLong(0), null, "stub")
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio near-duplicate candidates through the shared pigeonhole
    * Hamming join — the WAV twin of [[imageNearDupPairs]].
    */
  def audioNearDupPairs(media: DataFrame, chunks: Int = 4,
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingCandidatesFromBits(
      audioHashes(media).filter(col("decoder") === "javasound")
        .select(col("media_id").as("doc"), col("ahash").as("sig")),
      chunks, maxHamming)

  /** Partition-batched REAL audio decode: true rate/channels/bits/frame
    * count/sample sum for any payload the JVM's audio readers accept,
    * the deterministic stub for the rest — tagged by `decoder` like
    * [[decodeImages]]. One reader pipeline per partition.
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("sample_sum", LongType),
      StructField("decoder", StringType)))
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeAudioMeta(payload) match {
          case Some((rate, ch, bits, frames, sum)) =>
            Row(id, payload.length.toLong, rate, ch, bits, frames, sum, "javasound")
          case None =>
            val (w, h, _) = decodeStub(payload)
            Row(id, payload.length.toLong, 0, 0, 0, w.toLong * h, 0L, "stub")
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Encode an animated grayscale GIF through the JVM's real GIF
    * SEQUENCE writer (`pix(frame)(x, y)` supplies each frame). The
    * explicit 256-gray IndexColorModel is load-bearing: an indexed
    * raster writes its palette verbatim so the round-trip is LOSSLESS
    * (sample index == gray value), where a TYPE_BYTE_GRAY raster would
    * go through the writer's RGB quantization.
    */
  def encodeGrayAnimatedGif(w: Int, h: Int, nFrames: Int,
                            pix: Int => (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, "dims and frame count must be positive")
    val grays = Array.tabulate(256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    // JDK GIF writer quirk: the default write param flags frames as
    // interlaced but emits row-ordered data, so a reader de-interlaces
    // rows that were never interlaced — rows come back scrambled and the
    // tail rows blank. MODE_DISABLED makes flag and data agree.
    val wp = writer.getDefaultWriteParam
    wp.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      val p = pix(f)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, p(x, y) & 0xff); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), wp)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Animated fixtures from an (id, w, h, nFrames) frame — pixels =
    * [[testPattern]] seeded per frame (`id * 131 + frame`), so an oracle
    * recomputes every sampled frame's sum in plain arithmetic.
    */
  def grayGifTable(dims: DataFrame, idCol: String, wCol: String, hCol: String,
                   framesCol: String): DataFrame = {
    val spark = dims.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType)))
    val rdd = dims.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"), col(framesCol).cast("int"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id,
            encodeGrayAnimatedGif(r.getInt(1), r.getInt(2), r.getInt(3),
              f => testPattern(id * 131 + f)),
            "image/gif")
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL frame-sampled animation decode: total frame count plus every
    * `stride`-th frame's (frame_no, width, height, sample sum) read from
    * the payload bytes by whichever registered reader accepts them
    * (GIF's is multi-frame in every JVM; a single-frame PNG/BMP decodes
    * as a 1-frame animation). None when no reader accepts the bytes.
    * Skipped frames are never decoded — `reader.read(f)` is per-frame,
    * so cost follows kept frames like the byte-level [[sampleFrames]].
    */
  def decodeAnimation(payload: Array[Byte], stride: Int)
      : Option[(Int, Seq[(Int, Int, Int, Long)])] = {
    require(stride > 0, "stride must be positive")
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      reader.setInput(iis)
      try {
        val n = reader.getNumImages(true)
        val frames = (0 until n by stride).map { f =>
          val im = reader.read(f)
          val raster = im.getRaster
          // Exactness per color model: an indexed image's raw samples are
          // palette INDEXES and GIF writers may remap them — resolve
          // through the palette (exact color components). Everything else
          // (gray/RGB rasters) sums raw samples like decodeImageMeta —
          // getRGB would gamma-convert gray and break losslessness.
          var sum = 0L
          im.getColorModel match {
            case icm: java.awt.image.IndexColorModel =>
              val blues = new Array[Byte](icm.getMapSize)
              icm.getBlues(blues)
              var y = 0
              while (y < im.getHeight) {
                var x = 0
                while (x < im.getWidth) {
                  sum += blues(raster.getSample(x, y, 0)) & 0xff
                  x += 1
                }
                y += 1
              }
            case _ =>
              val bands = raster.getNumBands
              var y = 0
              while (y < im.getHeight) {
                var x = 0
                while (x < im.getWidth) {
                  var b = 0
                  while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
                  x += 1
                }
                y += 1
              }
          }
          (f, im.getWidth, im.getHeight, sum)
        }
        Some((n, frames))
      } finally reader.dispose()
      // NonFatal, not just IOException: the JDK GIF reader throws
      // unchecked exceptions (AIOOBE) on corrupt LZW data AFTER its SPI
      // accepted the signature — one bad payload in a corpus must become
      // a stub row, never a task failure
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Partition-batched REAL animation frame sampling: one row per kept
    * frame — (media_id, n_frames, frame_no, width, height, px_sum,
    * decoder) — via [[decodeAnimation]]; payloads no reader accepts keep
    * the tagged stub arm (one null-frame row), same discipline as
    * [[decodeImages]]/[[decodeAudio]].
    */
  def sampleAnimationFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("px_sum", LongType),
      StructField("decoder", StringType)))
    val rdd = media.select(col("media_id").cast("long"), col("payload"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          decodeAnimation(r.getAs[Array[Byte]](1), stride) match {
            case Some((n, frames)) => frames.iterator.map { case (f, w, h, s) =>
              Row(id, n, f, w, h, s, "imageio")
            }
            case None => Iterator.single(Row(id, null, null, null, null, null, "stub"))
          }
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
