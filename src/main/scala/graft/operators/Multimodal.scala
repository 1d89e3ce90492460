package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Decoded media features: true pixel dimensions + channel statistics for
  * payloads the JDK can decode, deterministic content-hash pseudo-features
  * for codecs it can't. `decoded` says which path produced the row. */
case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    format_guess: String,
    width: Int,
    height: Int,
    decoded: Boolean,
    features: Array[Float])

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode/feature-extract runs
  * per-partition in batches (the Scala analogue of mapInPandas batch
  * processing). Image decode is REAL for the formats the JDK ships
  * codecs for (PNG/JPEG/BMP/GIF via `javax.imageio` — zero added
  * dependencies): true width/height, per-channel means, luma histogram.
  * Payloads no installed codec can read fall back to a deterministic
  * content-hash stub so the pipeline stays total — swap-in point for
  * ffmpeg/opencv codecs in a production image.
  */
object Multimodal {

  val FeatureSchema: StructType = Encoders.product[MediaFeatures].schema

  /** Magic-byte container sniff — cheap, no decode attempt. */
  private[operators] def formatGuess(payload: Array[Byte]): String =
    if (payload.length >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
    else if (payload.length >= 4 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') "bmp"
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == '8') "gif"
    else "unknown"

  /** Real decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF). None when no
    * installed reader accepts the payload. */
  private[operators] def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Fallback for codecs the JVM lacks: deterministic pseudo-features from
    * a content hash, so unknown media still flows through the pipeline
    * with stable, reproducible values. Pure function of content. */
  private[operators] def stubFeatures(id: Long, payload: Array[Byte], featureDim: Int): MediaFeatures = {
    var h = 1125899906842597L // deterministic FNV-ish rolling hash of bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val rng = new scala.util.Random(h)
    val feats = Array.fill(featureDim)(rng.nextFloat())
    MediaFeatures(id, payload.length, formatGuess(payload),
      64 + (math.abs(h) % 1024).toInt, 64 + (math.abs(h / 7) % 1024).toInt,
      decoded = false, feats)
  }

  /** Decode one payload: true dimensions + feature vector
    * [meanR, meanG, meanB, meanLuma, luma histogram...] (all in [0,1]),
    * or the stub fallback when no codec accepts the bytes. */
  private[operators] def decodeRow(id: Long, payload: Array[Byte], featureDim: Int): MediaFeatures = {
    require(featureDim >= 4, s"featureDim $featureDim must be >= 4 (RGB means + luma)")
    decodeImage(payload) match {
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](featureDim - 4)
        var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            val luma = (r * 299 + g * 587 + b * 114) / 1000
            sr += r; sg += g; sb += b; sl += luma
            if (hist.nonEmpty) hist(luma * hist.length / 256) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val feats = new Array[Float](featureDim)
        feats(0) = sr.toFloat / (255f * n)
        feats(1) = sg.toFloat / (255f * n)
        feats(2) = sb.toFloat / (255f * n)
        feats(3) = sl.toFloat / (255f * n)
        var i = 0
        while (i < hist.length) { feats(4 + i) = hist(i).toFloat / n; i += 1 }
        MediaFeatures(id, payload.length, formatGuess(payload), w, h, decoded = true, feats)
      case None => stubFeatures(id, payload, featureDim)
    }
  }

  /** Decode + featurize binary payloads per partition. Input needs
    * (idCol: long, payloadCol: binary); output follows FeatureSchema.
    * Dataset.mapPartitions with a product encoder keeps rows in Tungsten
    * format (no InternalRow↔Row conversion) while the per-partition batch
    * shape stays codec-friendly. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, featureDim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // in-memory ImageInputStreams: ImageIO's default disk cache would
        // put a tmp-file write in every decode
        ImageIO.setUseCache(false)
        rows.map { case (id, payload) => decodeRow(id, payload, featureDim) }
      }
      .toDF()
  }

  /** Deterministic synthetic PNG per id: width = 8 + id % 32, height =
    * 8 + id % 16, solid RGB (id % 256, 7·id % 256, 13·id % 256). The
    * ground truth is arithmetic on the id, so a decode stage over these
    * payloads is fully oracle-checkable: recovered dimensions and channel
    * means must reproduce the formulas. Doubles as the fixture generator
    * for environments whose testdata has no real media columns. */
  def syntheticPngs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ImageIO.setUseCache(false)
        ids.map { id =>
          val w = (8 + math.floorMod(id, 32)).toInt
          val h = (8 + math.floorMod(id, 16)).toInt
          val rgb = (math.floorMod(id, 256).toInt << 16) |
            (math.floorMod(7 * id, 256).toInt << 8) | math.floorMod(13 * id, 256).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Gradient synthetic PNGs — the resize fixture: pixel (x,y) of image
    * id is r=(id+3x+5y)%256, g=(2·id+7x+11y)%256, b=(3·id+13x+17y)%256 on
    * the same (8+id%32)×(8+id%16) canvas as [[syntheticPngs]]. Because the
    * color varies per pixel, a resample stage has non-trivial ground
    * truth: the value at any sampled coordinate is a closed form of
    * (id, x, y) that an SQL oracle can replay. */
  def syntheticGradientPngs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ImageIO.setUseCache(false)
        ids.map { id =>
          val w = (8 + math.floorMod(id, 32)).toInt
          val h = (8 + math.floorMod(id, 16)).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = math.floorMod(id + 3 * x + 5 * y, 256).toInt
              val g = math.floorMod(2 * id + 7 * x + 11 * y, 256).toInt
              val b = math.floorMod(3 * id + 13 * x + 17 * y, 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decoded-thumbnail stats (float-free): integer channel sums over the
    * resampled grid, plus the recovered source dimensions. */
  case class ThumbFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      thumb_w: Int,
      thumb_h: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      decoded: Boolean)

  /** Real image RESIZE stage: decode via ImageIO, then nearest-neighbor
    * resample to tw×th — target cell (i,j) reads source pixel
    * (⌊i·w/tw⌋, ⌊j·h/th⌋), the standard O(thumbnail) resample (no full-
    * image pass, no float kernel). Emits integer per-channel sums over
    * the thumbnail so the correctness check needs no float tolerance;
    * undecodable payloads keep the totality contract (decoded=false,
    * zero sums). Same Tungsten-native Dataset.mapPartitions shape as
    * [[extractFeatures]]. */
  def resizeThumbnail(df: DataFrame, idCol: String, payloadCol: String, tw: Int, th: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some(img) =>
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var j = 0
              while (j < th) {
                val ys = j * h / th
                var i = 0
                while (i < tw) {
                  val xs = i * w / tw
                  val p = img.getRGB(xs, ys)
                  sr += (p >> 16) & 0xff
                  sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  i += 1
                }
                j += 1
              }
              ThumbFeatures(id, w, h, tw, th, sr, sg, sb, decoded = true)
            case None => ThumbFeatures(id, 0, 0, tw, th, 0L, 0L, 0L, decoded = false)
          }
        }
      }
      .toDF()
  }

  /** Decoded audio features: container header fields recovered by the
    * codec plus exact integer signal statistics (absolute-amplitude sum,
    * sign-change count) so downstream checks need no float tolerance. */
  case class AudioFeatures(
      doc_id: Long,
      codec: String,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      duration_ms: Long,
      sum_abs: Long,
      zero_crossings: Long,
      decoded: Boolean)

  /** Real audio decode via the JDK's sampled-sound stack
    * (`javax.sound.sampled.AudioSystem` reads WAV/AU/AIFF containers —
    * zero added dependencies): header-recovered rate/channels/frame count
    * plus integer PCM statistics. Payloads no installed codec accepts get
    * a deterministic content-hash stub (same totality contract as the
    * image path). */
  private[operators] def decodeAudioRow(id: Long, payload: Array[Byte]): AudioFeatures =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      val pcm = ais.readAllBytes()
      ais.close()
      val n = pcm.length / (bytesPerSample * fmt.getChannels)
      var sumAbs = 0L
      var crossings = 0L
      var prevSign = 0
      var i = 0
      while (i < n) {
        // 16-bit little-endian mono decode (the synthesized fixture
        // format); other layouts would switch here on fmt fields
        val lo = pcm(2 * i) & 0xff
        val hi = pcm(2 * i + 1).toInt
        val s = (hi << 8) | lo
        sumAbs += math.abs(s)
        val sign = Integer.signum(s)
        if (i > 0 && sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      AudioFeatures(id, "wav", fmt.getSampleRate.toInt, fmt.getChannels,
        n.toLong, n.toLong * 1000L / fmt.getSampleRate.toInt,
        sumAbs, crossings, decoded = true)
    } catch {
      case _: Exception =>
        var h = 1125899906842597L
        var i = 0
        while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
        AudioFeatures(id, "unknown", 0, 0, 0L, 0L, math.abs(h), 0L, decoded = false)
    }

  /** Decode + featurize audio payloads per partition — the audio leg of
    * the multimodal seam, same `Dataset.mapPartitions` + product-encoder
    * shape as [[extractFeatures]] (rows stay in Tungsten format, batches
    * stay codec-friendly). */
  def extractAudioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, payload) => decodeAudioRow(id, payload) })
      .toDF()
  }

  /** Deterministic synthetic WAV per id: 8 kHz 16-bit mono PCM square
    * wave with n = 256 + 4·(id % 256) samples, half-period 8 + id % 16
    * and amplitude 1000 + 100·(id % 100). Ground truth is arithmetic on
    * the id — |sample| is constant so sum_abs = n·A exactly and the wave
    * changes sign exactly at half-period boundaries, so
    * zero_crossings = ⌊(n−1)/hp⌋ — making the REAL `AudioSystem` decode
    * stage fully oracle-checkable, like [[syntheticPngs]] for images. */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (256 + math.floorMod(id, 256) * 4).toInt
          val hp = (8 + math.floorMod(id, 16)).toInt
          val amp = (1000 + math.floorMod(id, 100) * 100).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = if ((i / hp) % 2 == 0) amp else -amp
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          (id, out.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Deterministic frame sampling plan for video-ish payloads: emit
    * (doc_id, frame_idx) rows for every nth "frame" — explode-based, no
    * driver loop. Frame count is metadata (a real pipeline reads it from
    * the container header); here: bytes/1k. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, everyNth: Int): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      (length(col(payloadCol).cast("binary")) / 1000).cast("int").as("frame_cnt")
    ).select(
      col("doc_id"),
      explode(sequence(lit(0), greatest(col("frame_cnt") - 1, lit(0)), lit(everyNth))).as("frame_idx")
    )
}
