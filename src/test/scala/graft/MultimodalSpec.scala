package graft

import graft.queries.Multimodal

/** The mapPartitions decode path (stubbed codec, real plumbing). */
class MultimodalSpec extends SparkSpec {

  test("decode produces one feature row per media row, deterministic") {
    val a = Multimodal.decodeFeatures(spark, sf0001).collect()
    val b = Multimodal.decodeFeatures(spark, sf0001).collect()
    assert(a.length == Tables(spark, sf0001, "documents").count())
    assert(a.map(_.getLong(0)).sorted.sameElements(b.map(_.getLong(0)).sorted))
  }

  test("feature vectors have fixed width and normalized mass") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(spark, sf0001)
      .select($"doc_id", $"feature", $"n_bytes").as[(Long, Seq[Float], Int)]
      .collect()
    assert(feats.forall(_._2.size == 8), "feature width must be 8")
    // histogram mass: sum(feature) * n_bytes == n_bytes (all bytes binned)
    feats.foreach { case (id, f, n) =>
      val mass = f.map(_.toDouble).sum * math.max(1, n)
      assert(math.abs(mass - n) < 1e-3, s"doc $id: histogram mass $mass != $n")
    }
  }

  test("int8 quantization round-trips within scale/2 per element") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings").limit(100)
      .withColumn("scale",
        aggregate($"embedding", lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0)
      .filter($"scale" > 0)
    val maxErr = e.select(
        aggregate(
          transform($"embedding", x =>
            abs(floor(x.cast("double") / $"scale" + 0.5) * $"scale" - x.cast("double")) / $"scale"),
          lit(0.0), (a, v) => greatest(a, v)).as("relErr"))
      .agg(max($"relErr")).head.getDouble(0)
    assert(maxErr <= 0.5 + 1e-9, s"dequantization error $maxErr above scale/2")
  }

  test("pngTable payloads are genuine PNG bytes (magic + real decode)") {
    import spark.implicits._
    val rows = Multimodal.pngTable(spark, sf0001)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect()
    assert(rows.nonEmpty)
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    rows.foreach { case (id, bytes) =>
      assert(bytes.take(8).sameElements(pngMagic), s"doc $id: not a PNG header")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO cannot decode the payload")
      assert(img.getWidth == Multimodal.gridWidth(id), s"doc $id: width")
      assert(img.getHeight == Multimodal.gridHeight(id), s"doc $id: height")
    }
  }

  test("decodePng recovers the exact synthesized pixel grid") {
    import spark.implicits._
    val stats = Multimodal.decodePng(spark, sf0001)
      .select($"doc_id", $"width", $"height", $"sum_r", $"sum_g", $"sum_b")
      .as[(Long, Int, Int, Long, Long, Long)]
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { case (id, w, h, sr, sg, sb) =>
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.gridRgb(id, x, y)
        er += r; eg += g; eb += b
      }
      assert((sr, sg, sb) == ((er, eg, eb)),
        s"doc $id: decoded channel sums ($sr,$sg,$sb) != grid ($er,$eg,$eb)")
    }
  }

  test("wavTable payloads are genuine WAV bytes (RIFF magic + real decode)") {
    import spark.implicits._
    val rows = Multimodal.wavTable(spark, sf0001)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, bytes) =>
      assert(bytes.take(4).sameElements("RIFF".getBytes), s"doc $id: not a RIFF header")
      assert(bytes.slice(8, 12).sameElements("WAVE".getBytes), s"doc $id: not WAVE")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFrameLength == Multimodal.waveSamples(id), s"doc $id: frame count")
    }
  }

  test("decodeWav recovers the exact synthesized waveform") {
    import spark.implicits._
    val stats = Multimodal.decodeWav(spark, sf0001)
      .select($"doc_id", $"n_samples", $"sum_amp", $"min_amp", $"max_amp")
      .as[(Long, Int, Long, Int, Int)]
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { case (id, n, sum, mn, mx) =>
      val amps = (0 until Multimodal.waveSamples(id)).map(Multimodal.waveAmp(id, _))
      assert(n == amps.size, s"doc $id: sample count")
      assert(sum == amps.map(_.toLong).sum, s"doc $id: decoded sample sum")
      assert(mn == amps.min && mx == amps.max, s"doc $id: decoded min/max")
    }
  }

  test("binary payload survives the relational pipeline opaquely") {
    import spark.implicits._
    // filter + project + repartition must not disturb payload bytes
    val m = Multimodal.mediaTable(spark, sf0001)
    val before = m.select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect().toMap
    val after = m.repartition(7)
      .filter($"channels" === 3)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect().toMap
    assert(after.size == before.size)
    assert(after.forall { case (k, v) => java.util.Arrays.equals(v, before(k)) })
  }
}
