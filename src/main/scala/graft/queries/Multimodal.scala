package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B L6 + north-star multimodal columns.
  *
  * Model (SURVEY §1.1 opaque-payload rule): media is an opaque `binary`
  * column + a typed metadata struct carried through the relational
  * pipeline untouched; only dedicated decode/feature stages look inside.
  *
  * Two decode paths:
  *
  *  - '''Real codec (l6_decode_real)''': the fixture set ships no media
  *    files, so the media itself is synthesized — REAL PNG payloads
  *    encoded with the JDK's `javax.imageio` from a deterministic
  *    doc-derived pixel grid — then decoded back with the real
  *    `ImageIO.read` inside the batched mapPartitions stage. Decoded
  *    width/height/per-channel sums come from the DECODED pixels (PNG is
  *    lossless, so they equal the grid), and the oracle recomputes the
  *    same grid statistics relationally in DuckDB. A codec bug, a byte
  *    mangled in flight, or metadata read instead of pixels all break
  *    the hash.
  *  - '''Generic binary (l6_decode_features)''': document text bytes as
  *    an arbitrary opaque payload with a byte-histogram extractor — the
  *    path for formats with no JDK codec (audio/video), where only the
  *    plumbing shape (binary column, typed metadata, bounded batches)
  *    is under test.
  *
  * Scale: decode is a narrow mapPartitions — no shuffle; batch size
  * bounds peak memory per task regardless of partition size (the same
  * shape a vectorized/Arrow-batched UDF would have on a cluster with
  * the real codec libraries installed).
  */
object Multimodal {

  /** An opaque media row: payload + typed metadata. */
  final case class MediaRow(
      doc_id: Long,
      payload: Array[Byte],
      width: Int,
      height: Int,
      channels: Int,
      fmt: String)

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      mean_byte: Double,
      n_vowel_bytes: Int,
      feature: Array[Float])

  /** Attach the fake binary payload + deterministic metadata. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Qh.t(s, dir, "documents")
      .select(
        $"doc_id",
        $"text".cast(BinaryType).as("payload"),
        (($"doc_id" % 5) * 160 + 320).cast(IntegerType).as("width"),
        (($"doc_id" % 3) * 120 + 240).cast(IntegerType).as("height"),
        lit(3).as("channels"),
        lit("png").as("fmt"))
  }

  final case class PngRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  final case class PngStats(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Deterministic doc-derived pixel grid — the single definition shared
    * by the PNG encoder, the decode spec, and (as SQL arithmetic) the
    * DuckDB oracle. Channel value at (x, y) for `docId`. */
  private[graft] def gridRgb(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((docId * 31 + x * 7 + y * 13) % 256).toInt,
    ((docId * 17 + x * 11 + y * 5) % 256).toInt,
    ((docId * 29 + x * 3 + y * 19) % 256).toInt)

  private[graft] def gridWidth(docId: Long): Int = (8 + (docId % 5) * 4).toInt
  private[graft] def gridHeight(docId: Long): Int = (6 + (docId % 3) * 6).toInt

  /** REAL PNG payloads: one image per document, encoded per-partition
    * with the JDK codec (`javax.imageio`). Narrow map — no shuffle; the
    * encoder is the same per-row bounded-memory shape a real ingest
    * stage (fetch + transcode) has on a cluster. */
  def pngTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Qh.t(s, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no /tmp spill per image
        it.map { docId =>
          val w = gridWidth(docId); val h = gridHeight(docId)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = gridRgb(docId, x, y)
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          PngRow(docId, out.toByteArray, w, h)
        }
      }.toDF()
  }

  /** REAL codec decode: batched per-partition `ImageIO.read` over the
    * PNG payloads. Width/height/channel sums are taken from the DECODED
    * image — never from row metadata — so the decl only goes green if
    * the full encode→bytes→decode loop is lossless. Batch bound (64)
    * caps peak decoded-pixel memory per task regardless of partition
    * size. */
  def decodePng(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodePngRows(pngTable(s, dir).as[PngRow])
  }

  /** The decode stage alone, over any PngRow source — shared by the
    * in-table payload path (l6_decode_real) and the binaryFile ingest
    * path (s16), which differ only in where the bytes come from. */
  def decodePngRows(rows: org.apache.spark.sql.Dataset[PngRow]): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { row =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.payload))
          require(img != null, s"doc ${row.doc_id}: payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          PngStats(row.doc_id, w, h, w * h, sr, sg, sb)
        }
      }
    }.toDF()
  }

  final case class WavRow(doc_id: Long, payload: Array[Byte])

  final case class WavStats(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Int,
      sum_amp: Long,
      min_amp: Int,
      max_amp: Int)

  /** Deterministic doc-derived PCM waveform — shared by the WAV encoder,
    * the decode spec, and (as SQL arithmetic) the DuckDB oracle. */
  private[graft] def waveSamples(docId: Long): Int = (400 + (docId % 50) * 8).toInt
  private[graft] def waveAmp(docId: Long, i: Int): Int =
    ((docId * 37 + i * 11) % 2003 - 1001).toInt

  /** REAL WAV payloads: one 16-bit mono PCM clip per document, encoded
    * per-partition with the JDK audio codec (`javax.sound.sampled`).
    * Narrow map — no shuffle. */
  def wavTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Qh.t(s, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        it.map { docId =>
          val n = waveSamples(docId)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = waveAmp(docId, i)
            pcm(2 * i) = (v & 0xff).toByte // little-endian 16-bit signed
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          WavRow(docId, out.toByteArray)
        }
      }.toDF()
  }

  /** REAL audio decode: batched per-partition
    * `AudioSystem.getAudioInputStream` over the WAV payloads. Format
    * metadata (rate/channels/bits) and the per-sample statistics come
    * from the DECODED stream — PCM WAV is lossless, so the decl only
    * goes green if the encode→bytes→decode loop reproduces every
    * sample. */
  def decodeWav(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    wavTable(s, dir).as[WavRow].mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { row =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.payload))
          val f = ais.getFormat
          val n = ais.getFrameLength.toInt
          val bytes = ais.readAllBytes()
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          WavStats(row.doc_id, f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, n, sum, mn, mx)
        }
      }
    }.toDF()
  }

  /** The generic-binary decode stub: per-partition, batched iteration
    * (batch bound = 64 rows) producing a fixed-width feature vector.
    * Deterministic byte-histogram stand-in for codecs the JDK lacks. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir).as[MediaRow]
    media.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { m =>
          val bytes = m.payload
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.map(_ & 0xff).sum.toDouble / bytes.length
          val vowels = bytes.count(b => "aeiou".contains((b & 0xff).toChar))
          // fake feature: 8-bin byte histogram, normalized
          val hist = new Array[Float](8)
          bytes.foreach(b => hist((b & 0xff) / 32) += 1f)
          val n = math.max(1, bytes.length).toFloat
          MediaFeatures(m.doc_id, bytes.length, mean, vowels, hist.map(_ / n))
        }
      }
    }.toDF()
  }

  /** One encoded image per `doc_id % 15 == 0` document (the 8×6 size
    * class, so every image shares one hash geometry) as `img_id =
    * 2·doc_id`, plus a PERTURBED VARIANT (`img_id = 2·doc_id + 1`, red
    * channel of pixel (0,0) shifted +16 mod 256) for every
    * `doc_id % 90 == 0` — planted image near-dups whose decoded
    * luminance differs in at most one grid cell. Real JDK PNG codec on
    * both legs; narrow map, no shuffle. */
  private final case class PhashImg(img_id: Long, payload: Array[Byte])

  private[graft] def phashImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Qh.t(s, dir, "documents")
      .filter($"doc_id" % 15 === 0)
      .select($"doc_id").as[Long]
      .flatMap(d => Seq((d, 0), (d, 1)).filter(_._2 == 0 || d % 90 == 0))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (docId, variant) =>
          val img = new java.awt.image.BufferedImage(
            8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 6) {
            var x = 0
            while (x < 8) {
              val (r0, g, b) = gridRgb(docId, x, y)
              val r =
                if (variant == 1 && x == 0 && y == 0) (r0 + 16) % 256 else r0
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          PhashImg(docId * 2 + variant, out.toByteArray)
        }
      }.toDF()
  }

  /** Decoded luminance grid (r+g+b per pixel, index `i = y*8 + x`) from
    * the REAL `ImageIO.read` — the hash downstream sees only decoded
    * pixels, so a codec bug breaks the pair set. */
  private[graft] def phashLums(imgs: DataFrame): DataFrame = {
    import imgs.sparkSession.implicits._
    imgs.as[PhashImg].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(64).flatMap(_.iterator.map { row =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.payload))
        val lums = Array.tabulate(48) { i =>
          val rgb = img.getRGB(i % 8, i / 8)
          ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)
        }
        (row.img_id, lums)
      })
    }.toDF("img_id", "lums")
  }

  /** One encoded WAV clip per `doc_id % 50 == 0` document (the
    * 400-sample size class) as `clip_id = 2·doc_id`, plus a PERTURBED
    * VARIANT (`clip_id = 2·doc_id + 1`, sample 0 shifted +64) for
    * every `doc_id % 250 == 0` — planted audio near-dups. Real JDK
    * audio codec on both legs. */
  private final case class AfpClip(clip_id: Long, payload: Array[Byte])

  private[graft] def afpClips(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Qh.t(s, dir, "documents")
      .filter($"doc_id" % 50 === 0)
      .select($"doc_id").as[Long]
      .flatMap(d => Seq((d, 0), (d, 1)).filter(_._2 == 0 || d % 250 == 0))
      .mapPartitions { it =>
        it.map { case (docId, variant) =>
          val n = 400
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v0 = waveAmp(docId, i)
            val v = if (variant == 1 && i == 0) v0 + 64 else v0
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          AfpClip(docId * 2 + variant, out.toByteArray)
        }
      }.toDF()
  }

  /** Decoded frame energies (32 frames × 12 samples, Σ|amp| per frame)
    * from the REAL `AudioSystem` decode — the fingerprint downstream
    * sees only decoded samples, so a codec bug breaks the pair set. */
  private[graft] def afpEnergies(clips: DataFrame): DataFrame = {
    import clips.sparkSession.implicits._
    clips.as[AfpClip].mapPartitions { it =>
      it.grouped(64).flatMap(_.iterator.map { row =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        val bytes = ais.readAllBytes()
        val energies = Array.fill(32)(0L)
        var f = 0
        while (f < 32) {
          var j = 0
          var e = 0L
          while (j < 12) {
            val i = f * 12 + j
            val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
            e += math.abs(v.toLong)
            j += 1
          }
          energies(f) = e
          f += 1
        }
        (row.clip_id, energies)
      })
    }.toDF("clip_id", "energies")
  }

  val decls: Seq[Decl] = Seq(

    // Binary + metadata plumbing: SQL-checkable part of the surface.
    Decl(
      "l6_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  CAST((doc_id % 5) * 160 + 320 AS INT) AS width,
        |  CAST((doc_id % 3) * 120 + 240 AS INT) AS height,
        |  3 AS channels,
        |  'png' AS fmt,
        |  CAST((doc_id % 5) * 160 + 320 AS INT) * CAST((doc_id % 3) * 120 + 240 AS INT) * 3 AS n_pixels
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaTable(s, dir)
        .select(
          $"doc_id",
          length($"payload").as("n_bytes"),
          $"width", $"height", $"channels", $"fmt",
          ($"width" * $"height" * $"channels").as("n_pixels"))
        .orderBy("doc_id")
    },

    // Resize + frame-sample stubs: stride-slicing the opaque payload
    // stands in for pixel resampling / video frame extraction (no codec
    // libs in this container) — the Spark-side shape (byte arithmetic in
    // the plan, deterministic stride params from metadata) is real.
    Decl(
      "l6_resize_framesample",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  CAST((doc_id % 5) * 160 + 320 AS INT) / 2 AS resized_w,
        |  CAST((doc_id % 3) * 120 + 240 AS INT) / 2 AS resized_h,
        |  CAST(ceil(CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE) / 4.0) AS INT) AS n_resized_bytes,
        |  CAST(floor((octet_length(CAST(text AS BLOB)) + 31) / 32) AS INT) AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaTable(s, dir)
        .select(
          $"doc_id",
          length($"payload").as("n_bytes"),
          ($"width" / 2).as("resized_w"),
          ($"height" / 2).as("resized_h"),
          // 2x downsample in both axes = every 4th byte survives
          ceil(length($"payload").cast(DoubleType) / 4.0).cast(IntegerType)
            .as("n_resized_bytes"),
          // frame-sample: one "frame" per 32-byte chunk
          floor((length($"payload") + 31) / 32).cast(IntegerType).as("n_frames"))
        .orderBy("doc_id")
    },

    // int8 symmetric quantization of embeddings (the storage path for
    // large vector corpora: 4× smaller than float32). scale = max|x|/127;
    // q = round(x/scale) — same half-up rounding formula both engines so
    // the quantized checksums hash-match. Dequant error bound asserted
    // in MultimodalSpec.
    Decl(
      "l6_quantize_int8",
      """WITH q AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
        |    embedding
        |  FROM embeddings)
        |SELECT vec_id,
        |  floor(scale * 1000000 + 0.5) / 1000000.0 AS scale_r6,
        |  CAST(list_sum(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(list_min(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))) AS BIGINT) AS q_min,
        |  CAST(list_max(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))) AS BIGINT) AS q_max
        |FROM q
        |WHERE scale > 0
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "embeddings")
        .withColumn("scale",
          aggregate($"embedding", lit(0.0),
            (acc, x) => greatest(acc, abs(x.cast(DoubleType)))) / 127.0)
        .filter($"scale" > 0)
        .withColumn("q",
          transform($"embedding",
            x => floor(x.cast(DoubleType) / $"scale" + 0.5).cast(LongType)))
        .select(
          $"vec_id",
          Qh.r6($"scale").as("scale_r6"),
          aggregate($"q", lit(0L), (a, v) => a + v).as("q_sum"),
          array_min($"q").as("q_min"),
          array_max($"q").as("q_max"))
        .orderBy("vec_id")
    },

    // REAL codec decode: synthesize genuine PNG bytes (javax.imageio)
    // from the deterministic doc-derived grid, decode them back with the
    // real ImageIO.read, and report decoded dimensions + per-channel
    // means. The oracle recomputes the same grid statistics relationally
    // (unnest × unnest cross grid), so the decl is only green when the
    // encode→bytes→decode loop reproduces every pixel.
    Decl(
      "l6_decode_real",
      """WITH px AS (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 5) * 4 AS INT) AS width,
        |    CAST(6 + (doc_id % 3) * 6 AS INT) AS height
        |  FROM documents),
        |gx AS (SELECT doc_id, width, height, unnest(range(width)) AS x FROM px),
        |gxy AS (SELECT doc_id, width, height, x, unnest(range(height)) AS y FROM gx)
        |SELECT doc_id, width, height,
        |  CAST(width * height AS INT) AS n_pixels,
        |  floor(CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS DOUBLE) / (width * height) * 1000000 + 0.5) / 1000000.0 AS mean_r,
        |  floor(CAST(sum((doc_id * 17 + x * 11 + y * 5) % 256) AS DOUBLE) / (width * height) * 1000000 + 0.5) / 1000000.0 AS mean_g,
        |  floor(CAST(sum((doc_id * 29 + x * 3 + y * 19) % 256) AS DOUBLE) / (width * height) * 1000000 + 0.5) / 1000000.0 AS mean_b
        |FROM gxy
        |GROUP BY doc_id, width, height
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      decodePng(s, dir)
        .select(
          $"doc_id", $"width", $"height", $"n_pixels",
          Qh.r6($"sum_r".cast(DoubleType) / $"n_pixels").as("mean_r"),
          Qh.r6($"sum_g".cast(DoubleType) / $"n_pixels").as("mean_g"),
          Qh.r6($"sum_b".cast(DoubleType) / $"n_pixels").as("mean_b"))
        .orderBy("doc_id")
    },

    // REAL audio decode: synthesize genuine 16-bit PCM WAV clips
    // (javax.sound.sampled) from a deterministic doc-derived waveform,
    // decode them back with the real AudioSystem codec, and report
    // decoded format + per-sample statistics. PCM WAV is lossless, so
    // the relational recomputation of the waveform in DuckDB matches
    // exactly — a codec bug, a mangled byte, or metadata read instead
    // of samples all break the hash.
    Decl(
      "l6_decode_audio",
      """WITH w AS (
        |  SELECT doc_id, CAST(400 + (doc_id % 50) * 8 AS INT) AS n FROM documents),
        |gx AS (SELECT doc_id, n, unnest(range(n)) AS i FROM w),
        |amp AS (
        |  SELECT doc_id, n,
        |    CAST((doc_id * 37 + i * 11) % 2003 - 1001 AS INT) AS v
        |  FROM gx)
        |SELECT doc_id,
        |  8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |  CAST(max(n) AS INT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_amp,
        |  CAST(min(v) AS INT) AS min_amp,
        |  CAST(max(v) AS INT) AS max_amp
        |FROM amp
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      decodeWav(s, dir)
        .select($"doc_id", $"sample_rate", $"channels", $"bits",
          $"n_samples", $"sum_amp", $"min_amp", $"max_amp")
        .orderBy("doc_id")
    },

    // Decode + feature extraction (mapPartitions path): checksum columns
    // of the fake decode are SQL-expressible, so even the stubbed codec
    // path gets a DuckDB oracle (mean byte + vowel-byte count).
    Decl(
      "l6_decode_features",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  floor((CAST(list_sum(list_transform(range(length(text)), i -> unicode(text[i+1]))) AS DOUBLE) / length(text)) * 1000000 + 0.5) / 1000000.0 AS mean_byte,
        |  CAST(len(list_filter(list_transform(range(length(text)), i -> text[i+1]), c -> list_contains(['a','e','i','o','u'], c))) AS INT) AS n_vowel_bytes
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      decodeFeatures(s, dir)
        .select($"doc_id", $"n_bytes", Qh.r6($"mean_byte").as("mean_byte"),
          $"n_vowel_bytes")
        .orderBy("doc_id")
    },

    // L6g: PERCEPTUAL-HASH IMAGE DEDUP — the multimodal member of the
    // L2 dedup family: encode (real PNG codec) → decode (real
    // ImageIO.read) → 48-bit average-hash over the DECODED luminance
    // grid (bit_i set iff 48·lum_i > Σlum — integer cross-multiply, no
    // float mean) → banded Hamming pair mining, the l2_simhash_hamming
    // discipline: 4 bands of 12 bits, and 4 bands > hamming cap 2
    // makes the banding EXACT by pigeonhole, so the engine must
    // produce precisely the oracle's full-quadratic pair set. Pairs
    // come from planted perturbed variants (one pixel shifted — at
    // most one luminance cell moves) and from grid collisions
    // (doc_id ≡ doc_id' mod 256 yields identical images — true dups).
    // Everything from the hash down is codegen HOFs + one band
    // equi-join; the only non-relational stage is the codec itself,
    // and a codec bug breaks the pair set. At 100 TB band cardinality
    // (2^12 per band) is the block-size dial, same as SimHash.
    Decl(
      "l6_phash_dedup",
      """WITH base AS (
        |  SELECT doc_id, 2 * doc_id AS img_id, 0 AS variant
        |  FROM documents WHERE doc_id % 15 = 0
        |  UNION ALL
        |  SELECT doc_id, 2 * doc_id + 1, 1
        |  FROM documents WHERE doc_id % 90 = 0),
        |g AS (SELECT img_id, doc_id, variant, unnest(range(8)) AS x FROM base),
        |gxy AS (SELECT img_id, doc_id, variant, x, unnest(range(6)) AS y FROM g),
        |lum AS (
        |  SELECT img_id, CAST(y * 8 + x AS BIGINT) AS i,
        |    (CASE WHEN variant = 1 AND x = 0 AND y = 0
        |          THEN ((doc_id * 31 + x * 7 + y * 13) % 256 + 16) % 256
        |          ELSE (doc_id * 31 + x * 7 + y * 13) % 256 END)
        |    + (doc_id * 17 + x * 11 + y * 5) % 256
        |    + (doc_id * 29 + x * 3 + y * 19) % 256 AS l
        |  FROM gxy),
        |t AS (SELECT img_id, sum(l) AS total FROM lum GROUP BY img_id),
        |h AS (
        |  SELECT lum.img_id,
        |    sum(CASE WHEN 48 * l > total THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS hash
        |  FROM lum JOIN t ON t.img_id = lum.img_id
        |  GROUP BY lum.img_id)
        |SELECT a.img_id AS img_a, b.img_id AS img_b,
        |  CAST(bit_count(xor(a.hash, b.hash)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.img_id < b.img_id
        |WHERE bit_count(xor(a.hash, b.hash)) <= 2
        |ORDER BY img_a, img_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val hashes = phashLums(phashImages(s, dir))
        .withColumn("total", expr("aggregate(lums, 0L, (a, x) -> a + x)"))
        .withColumn("hash", expr(
          """aggregate(sequence(0, 47), 0L,
            |  (a, i) -> a + IF(48 * lums[i] > total, shiftleft(1L, i), 0L))""".stripMargin))
        .select($"img_id", $"hash")
      val banded = hashes.select($"img_id", $"hash",
          explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("band", expr("shiftrightunsigned(hash, b * 12) & 4095"))
      banded.as("x").join(banded.as("y"),
          $"x.b" === $"y.b" && $"x.band" === $"y.band" &&
            $"x.img_id" < $"y.img_id")
        .select($"x.img_id".as("img_a"), $"y.img_id".as("img_b"),
          bit_count($"x.hash".bitwiseXOR($"y.hash")).as("hamming"))
        .distinct()
        .filter($"hamming" <= 2)
        .orderBy("img_a", "img_b")
    },

    // L6h: AUDIO-FINGERPRINT DEDUP — the audio twin of l6_phash_dedup,
    // proving the perceptual-dedup pattern generalizes across
    // modalities with the REAL codec in the loop: encode (JDK WAV) →
    // decode (AudioSystem) → 32-frame energy envelope over the DECODED
    // samples (Σ|amp| per 12-sample frame — the shape a spectral
    // fingerprint reduces to for this synthetic signal class) → 32-bit
    // signature (bit_f set iff 32·e_f > Σe, integer cross-multiply) →
    // banded Hamming pairs (4 bands × 8 bits, exact at cap 2 by
    // pigeonhole). Pairs: planted one-sample variants (one frame
    // energy moves by ≤64) and doc_id ≡ doc_id' mod 2003 waveform
    // collisions (true dups). Only the codec is non-relational.
    Decl(
      "l6_audio_fp_dedup",
      """WITH base AS (
        |  SELECT doc_id, 2 * doc_id AS clip_id, 0 AS variant
        |  FROM documents WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id, 2 * doc_id + 1, 1
        |  FROM documents WHERE doc_id % 250 = 0),
        |fr AS (SELECT clip_id, doc_id, variant, unnest(range(32)) AS f FROM base),
        |fi AS (SELECT clip_id, doc_id, variant, f, unnest(range(12)) AS j FROM fr),
        |samp AS (
        |  SELECT clip_id, f,
        |    abs((doc_id * 37 + (f * 12 + j) * 11) % 2003 - 1001
        |      + CASE WHEN variant = 1 AND f = 0 AND j = 0 THEN 64 ELSE 0 END) AS a
        |  FROM fi),
        |en AS (SELECT clip_id, f, sum(a) AS e FROM samp GROUP BY clip_id, f),
        |t AS (SELECT clip_id, sum(e) AS total FROM en GROUP BY clip_id),
        |h AS (
        |  SELECT en.clip_id,
        |    sum(CASE WHEN 32 * e > total THEN (CAST(1 AS BIGINT) << f) ELSE 0 END) AS hash
        |  FROM en JOIN t ON t.clip_id = en.clip_id
        |  GROUP BY en.clip_id)
        |SELECT a.clip_id AS clip_a, b.clip_id AS clip_b,
        |  CAST(bit_count(xor(a.hash, b.hash)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.clip_id < b.clip_id
        |WHERE bit_count(xor(a.hash, b.hash)) <= 2
        |ORDER BY clip_a, clip_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val hashes = afpEnergies(afpClips(s, dir))
        .withColumn("total", expr("aggregate(energies, 0L, (a, x) -> a + x)"))
        .withColumn("hash", expr(
          """aggregate(sequence(0, 31), 0L,
            |  (a, f) -> a + IF(32 * energies[f] > total, shiftleft(1L, f), 0L))""".stripMargin))
        .select($"clip_id", $"hash")
      val banded = hashes.select($"clip_id", $"hash",
          explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("band", expr("shiftrightunsigned(hash, b * 8) & 255"))
      banded.as("x").join(banded.as("y"),
          $"x.b" === $"y.b" && $"x.band" === $"y.band" &&
            $"x.clip_id" < $"y.clip_id")
        .select($"x.clip_id".as("clip_a"), $"y.clip_id".as("clip_b"),
          bit_count($"x.hash".bitwiseXOR($"y.hash")).as("hamming"))
        .distinct()
        .filter($"hamming" <= 2)
        .orderBy("clip_a", "clip_b")
    }
  )
}
