package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: opaque binary payloads + typed metadata. The decode
  * step is REAL for four pure-JVM formats — 24-bit BMP, 16-bit PCM WAV,
  * 8-bit PNG (via [[MediaCodecs]]) and baseline JPEG (via [[JpegCodec]]);
  * [[decodeMedia]] dispatches on the container magic. Codec-dependent
  * formats beyond those (MP3/H.264) remain STUBBED: the Spark-side
  * plumbing — schema, batch shape, partition-wise execution — is
  * identical, so swapping `decodeStub` for a codec call is a one-line
  * change at deployment.
  *
  * Layout: `payload: binary` + `meta: map<string,string>` sidecar — the
  * BinaryType + MapType pattern for 100 TB media tables; payloads stay
  * opaque to Catalyst so column pruning drops them unless referenced.
  */
object MultimodalOps {

  /** Per-payload features decoded from real container bytes: image fields
    * for BMP payloads, audio fields for WAV, zeros for the other modality.
    * `r00`/`g00` are the top-left pixel's R/G — they catch a decoder that
    * forgets BMP's bottom-up row order or BGR channel order; the sums are
    * whole-payload checksums.
    */
  final case class DecodedMedia(id: Long, source: String, format: String,
                                width: Int, height: Int, r00: Int, g00: Int,
                                sumR: Long, sampleRate: Int, nSamples: Int,
                                sumSamples: Long)

  /** Partition-wise REAL decode of `(id, source, payload)` rows, dispatching
    * on the container magic ("BM" → BMP, "RIFF" → WAV, the 8-byte PNG
    * signature → PNG). Scan-shaped: no shuffle, no driver involvement —
    * the same iterator contract a mapInPandas decode batch has.
    */
  def decodeMedia(df: DataFrame): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, bytes) =>
          if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
            val img = MediaCodecs.decodeBmp(bytes)
            var sumR = 0L
            var p = 0
            while (p < img.width * img.height) { sumR += img.rgb(p * 3) & 0xff; p += 1 }
            DecodedMedia(id, src, "image/bmp", img.width, img.height,
              img.rgb(0) & 0xff, img.rgb(1) & 0xff, sumR, 0, 0, 0L)
          } else if (MediaCodecs.isPng(bytes)) {
            val img = MediaCodecs.decodePng(bytes)
            val ch = img.channels
            var sumR = 0L
            var p = 0
            while (p < img.width * img.height) { sumR += img.pixels(p * ch) & 0xff; p += 1 }
            DecodedMedia(id, src, "image/png", img.width, img.height,
              img.pixels(0) & 0xff,
              (if (ch >= 3) img.pixels(1) else img.pixels(0)) & 0xff,
              sumR, 0, 0, 0L)
          } else if (JpegCodec.isJpeg(bytes)) {
            val img = JpegCodec.decode(bytes)
            val ch = img.channels
            var sumR = 0L
            var p = 0
            while (p < img.width * img.height) { sumR += img.pixels(p * ch) & 0xff; p += 1 }
            DecodedMedia(id, src, "image/jpeg", img.width, img.height,
              img.pixels(0) & 0xff,
              (if (ch >= 3) img.pixels(1) else img.pixels(ch)) & 0xff,
              sumR, 0, 0, 0L)
          } else if (GifCodec.isGif(bytes)) {
            val img = GifCodec.decodeGif(bytes)
            var sumR = 0L
            var p = 0
            while (p < img.width * img.height) { sumR += img.rgb(p * 3) & 0xff; p += 1 }
            DecodedMedia(id, src, "image/gif", img.width, img.height,
              img.rgb(0) & 0xff, img.rgb(1) & 0xff, sumR, 0, 0, 0L)
          } else if (bytes.length >= 4 &&
              bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') {
            val wav = MediaCodecs.decodeWav(bytes)
            var ss = 0L
            wav.samples.foreach(ss += _)
            DecodedMedia(id, src, "audio/wav", 0, 0, 0, 0, 0L,
              wav.sampleRate, wav.samples.length, ss)
          } else DecodedMedia(id, src, "unknown", 0, 0, 0, 0, 0L, 0, 0, 0L)
        }
      }
  }

  /** REAL media resize: decode the payload, box-average `factor`×`factor`
    * pixel blocks (with +half rounding, the encoder-subsample convention),
    * and RE-ENCODE in the same container — BMP stays exact, JPEG gray and
    * 4:2:0 color re-encode at quality 85. Partition-local: payload in,
    * payload out, no shuffle, no driver. Dimensions must be multiples of
    * `factor` (media pipelines pad at ingest); other formats pass through
    * unchanged (`resized = false`).
    */
  def resizeMedia(df: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 2, s"resize factor $factor")
    val spark = df.sparkSession
    import spark.implicits._
    def shrink(src: Array[Byte], w: Int, h: Int, ch: Int): Array[Byte] = {
      val ow = w / factor; val oh = h / factor
      val out = new Array[Byte](ow * oh * ch)
      val half = factor * factor / 2
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          var c = 0
          while (c < ch) {
            var s = 0
            var dy = 0
            while (dy < factor) {
              var dx = 0
              while (dx < factor) {
                s += src(((y * factor + dy) * w + x * factor + dx) * ch + c) & 0xff
                dx += 1
              }
              dy += 1
            }
            out((y * ow + x) * ch + c) = ((s + half) / (factor * factor)).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
    df.select(col("id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, bytes) =>
          if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
            val img = MediaCodecs.decodeBmp(bytes)
            require(img.width % factor == 0 && img.height % factor == 0,
              s"BMP dims ${img.width}x${img.height} not a multiple of $factor")
            val small = shrink(img.rgb, img.width, img.height, 3)
            (id, src, MediaCodecs.encodeBmp(MediaCodecs.BmpImage(
              img.width / factor, img.height / factor, small)), true)
          } else if (JpegCodec.isJpeg(bytes)) {
            val img = JpegCodec.decode(bytes)
            require(img.width % factor == 0 && img.height % factor == 0,
              s"JPEG dims ${img.width}x${img.height} not a multiple of $factor")
            val small = shrink(img.pixels, img.width, img.height, img.channels)
            val enc =
              if (img.channels == 1)
                JpegCodec.encodeGray(img.width / factor, img.height / factor,
                  small, 85)
              else
                JpegCodec.encodeColor420(img.width / factor, img.height / factor,
                  small, 85)
            (id, src, enc, true)
          } else (id, src, bytes, false)
        }
      }.toDF("id", "source", "payload", "resized")
  }

  /** Per-frame audio features from REAL WAV decode: frame-wise absolute
    * energy (exact long) and zero-crossing count (sign(s) flips, zero
    * counted non-negative, within-frame transitions only) — the standard
    * cheap audio featurizer, partition-local, exact integers end-to-end.
    */
  final case class AudioFrame(id: Long, source: String, frameIdx: Int,
                              n: Int, energy: Long, zeroCross: Int)

  /** REAL audio resample: integer-factor decimation — decode PCM, average
    * each `factor` consecutive frames per channel with sign-aware +half
    * rounding (the exact arithmetic both engines reproduce), re-encode at
    * sampleRate/factor. Partition-local payload→payload like
    * [[resizeMedia]]; frame count must divide by `factor` (pipelines pad
    * at ingest); non-WAV payloads pass through unchanged.
    */
  def resampleAudio(df: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 2, s"resample factor $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, bytes) =>
          val isWav = bytes.length >= 4 && bytes(0) == 'R' &&
            bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'
          if (!isWav) (id, src, bytes, false)
          else {
            val w = MediaCodecs.decodeWav(bytes)
            val ch = w.channels
            val nFrames = w.samples.length / ch
            require(nFrames % factor == 0,
              s"$id: $nFrames frames not divisible by $factor")
            val out = new Array[Short](w.samples.length / factor)
            var f = 0
            while (f < nFrames / factor) {
              var c = 0
              while (c < ch) {
                var acc = 0L
                var k = 0
                while (k < factor) {
                  acc += w.samples(((f * factor + k) * ch) + c)
                  k += 1
                }
                // round half away from zero, both signs
                val v =
                  if (acc >= 0) (acc + factor / 2) / factor
                  else -((-acc + factor / 2) / factor)
                out(f * ch + c) = v.toShort
                c += 1
              }
              f += 1
            }
            (id, src,
              MediaCodecs.encodeWav(MediaCodecs.WavAudio(
                w.sampleRate / factor, ch, out)), true)
          }
        }
      }.toDF("id", "source", "payload", "resampled")
  }

  def audioFrames(df: DataFrame, frameSize: Int): Dataset[AudioFrame] = {
    require(frameSize >= 2, s"frameSize $frameSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, src, bytes) =>
          val wav = MediaCodecs.decodeWav(bytes)
          val ns = wav.samples.length
          val nFrames = (ns + frameSize - 1) / frameSize
          (0 until nFrames).map { f =>
            val from = f * frameSize
            val until = math.min(from + frameSize, ns)
            var energy = 0L
            var zc = 0
            var i = from
            while (i < until) {
              energy += math.abs(wav.samples(i).toLong)
              if (i > from &&
                (wav.samples(i - 1) < 0) != (wav.samples(i) < 0)) zc += 1
              i += 1
            }
            AudioFrame(id, src, f, until - from, energy, zc)
          }
        }
      }
  }

  /** REAL image featurization: per-channel sums plus a 16-bin histogram of
    * channel 0 (bucket = v >> 4), folded into an order-free integer
    * checksum Σ cnt·(bucket·37 + 1) so engines can compare it without an
    * array column. Dispatches on the container magic like [[decodeMedia]];
    * exact longs end-to-end. */
  final case class ImageFeatures(id: Long, source: String, format: String,
                                 width: Int, height: Int, sumC0: Long,
                                 sumC1: Long, sumC2: Long, histChecksum: Long)

  def imageFeatures(df: DataFrame): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    def feats(id: Long, src: String, fmt: String, w: Int, h: Int, ch: Int,
              px: Array[Byte]): ImageFeatures = {
      var s0 = 0L; var s1 = 0L; var s2 = 0L
      val hist = new Array[Long](16)
      var p = 0
      while (p < w * h) {
        val v0 = px(p * ch) & 0xff
        s0 += v0
        hist(v0 >> 4) += 1
        if (ch >= 3) { s1 += px(p * ch + 1) & 0xff; s2 += px(p * ch + 2) & 0xff }
        p += 1
      }
      var hc = 0L
      var b = 0
      while (b < 16) { hc += hist(b) * (b * 37 + 1); b += 1 }
      ImageFeatures(id, src, fmt, w, h, s0, s1, s2, hc)
    }
    df.select(col("id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, bytes) =>
          if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
            val img = MediaCodecs.decodeBmp(bytes)
            feats(id, src, "image/bmp", img.width, img.height, 3, img.rgb)
          } else if (MediaCodecs.isPng(bytes)) {
            val img = MediaCodecs.decodePng(bytes)
            feats(id, src, "image/png", img.width, img.height, img.channels,
              img.pixels)
          } else if (JpegCodec.isJpeg(bytes)) {
            val img = JpegCodec.decode(bytes)
            feats(id, src, "image/jpeg", img.width, img.height, img.channels,
              img.pixels)
          } else if (GifCodec.isGif(bytes)) {
            val img = GifCodec.decodeGif(bytes)
            feats(id, src, "image/gif", img.width, img.height, 3, img.rgb)
          } else ImageFeatures(id, src, "unknown", 0, 0, 0L, 0L, 0L, 0L)
        }
      }
  }

  /** Media features produced by the (stubbed) decoder. */
  final case class MediaFeatures(id: Long, nBytes: Int, width: Int,
                                 height: Int, meanByte: Double)

  /** Wrap a string column as an opaque binary payload with metadata —
    * stand-in ingest for real media bytes.
    */
  def packBinary(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(srcCol).cast("binary").as("payload"),
      map(lit("format"), lit("fake/raw"), lit("src"), lit(srcCol)).as("meta"))

  /** STUB decode as pure column expressions: deterministic fake dimensions
    * derived from the payload length. A real decoder replaces these with a
    * codec call; everything downstream (grouping, filtering, joining on the
    * decoded metadata) is unchanged.
    */
  def decodeStubExprs(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")))
      .withColumn("width", (col("n_bytes") % 64 + lit(1)).cast("int"))
      .withColumn("height", (col("n_bytes") % 48 + lit(1)).cast("int"))

  /** STUB resize: slices the payload to the target pixel budget and rewrites
    * the decoded dimensions — a real implementation decodes, resamples and
    * re-encodes here. The plumbing that matters survives: a per-row binary
    * transform with updated metadata, no driver involvement.
    */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn("payload",
        substring(col("payload"), 1, targetW * targetH))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))

  /** STUB frame sampling: treats the payload as a sequence of
    * `frameBytes`-sized frames and emits every `everyN`-th frame as its own
    * row (frame index + frame payload + frame length) — the row-explosion
    * fan-out a video pipeline needs, with the decode left to a real codec.
    * Empty payloads produce no frames.
    */
  def frameSampleStub(df: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
      .cast("long")
    df.filter(length(col("payload")) > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), nFrames - 1, lit(everyN.toLong))))
      .withColumn("frame",
        substring(col("payload"), (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)))
      .withColumn("frame_len", length(col("frame")))
  }

  /** Partition-wise batch feature extraction — the integration point where a
    * real codec would decode a batch of payloads at once (the Scala analog
    * of mapInPandas batches). The stub computes the mean byte value; the
    * iterator shape (one partition in, features out, no driver involvement)
    * is the part that matters at scale.
    */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: a real implementation decodes `bytes` here
          val mean = if (bytes.isEmpty) 0.0
                     else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          MediaFeatures(id, bytes.length, bytes.length % 64 + 1,
            bytes.length % 48 + 1, mean)
        }
      }
  }
}
