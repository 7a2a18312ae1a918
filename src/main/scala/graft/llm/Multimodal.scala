package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** One media row: opaque binary payload + typed metadata (the multimodal
  * column model — SURVEY.md §2.2 north star). */
case class MediaRecord(
    doc_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte],
    width: Int, height: Int, // image/video
    n_frames: Int, // video
    sample_rate: Int) // audio

/** Decoded/extracted features for one media row. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    out_width: Int, out_height: Int,
    sampled_frames: Array[Int],
    histogram: Array[Long])

/** Multimodal-column operators: image/audio/video as opaque `binary` columns
  * with typed metadata; decode / feature-extract / resize / frame-sample run
  * as a batched `mapPartitions` over a typed Dataset — the Scala analog of a
  * Pandas-UDF `mapInPandas` stage (per-partition batch amortizes decoder
  * setup; rows stream through without driver involvement).
  *
  * The codec step is a pluggable seam ([[Multimodal.MediaCodec]], selected
  * by `graft.multimodal.codec`): the DEFAULT is a deterministic stub (this
  * container ships no media libs beyond the JDK — see `FakeCodec`), and a
  * real JDK-imageio decoder rides the same trait (`ImageIoCodec`).
  * Everything Spark-side — schema, binary column handling, partitioning,
  * batch shape — is real and tested (LlmSpec).
  */
object Multimodal {

  /** The pluggable decoder contract (r7 VERDICT item 4): bytes → sample
    * buffer. Implementations are resolved BY NAME inside the
    * `mapPartitions` batch (see [[extractFeatures]]) so per-partition codec
    * state — native handles, thread-local decoders — initializes once per
    * partition on the executor, never serializes from the driver. A real
    * deployment registers a JavaCV/libvips/ffmpeg-backed instance in
    * [[MediaCodec.forName]]; the stub and the JDK-imageio decoder below
    * implement the same seam. */
  trait MediaCodec extends Serializable {
    /** Decode a payload into a sample buffer (pixel luminances / PCM
      * samples), each value in [0, 255]. */
    def decode(payload: Array[Byte]): Array[Int]

    /** "Resize": target dims are a pure function of source dims (geometry
      * only — shared by every codec). */
    def resizedDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      if (w <= maxSide && h <= maxSide) (w, h)
      else {
        val scale = maxSide.toDouble / math.max(w, h)
        (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
      }
    }
  }

  object MediaCodec {
    /** Session conf key selecting the codec for [[qMultimodal]];
      * default = the deterministic stub (this container ships no media
      * libraries beyond the JDK). */
    val CodecKey = "graft.multimodal.codec"

    /** Name → implementation registry. The name (a string, not an
      * instance) is what crosses the driver/executor boundary. */
    def forName(name: String): MediaCodec = name match {
      case "fake" => FakeCodec
      case "imageio" => ImageIoCodec
      case "wav" => WavCodec
      case other => throw new IllegalArgumentException(
        s"unknown media codec '$other' (known: fake, imageio, wav)")
    }
  }

  /** STUB decoder: deterministic arithmetic over the payload bytes only —
    * keeps the whole pipeline oracle-replayable in SQL (the corpus payloads
    * are text bytes, not real media). */
  object FakeCodec extends MediaCodec {
    /** "Decode" a payload into a byte-valued sample buffer. */
    def decode(payload: Array[Byte]): Array[Int] = payload.map(b => b & 0xFF)
  }

  /** A REAL decoder on the same seam, built from the JDK alone:
    * `javax.imageio` (PNG/JPEG/GIF/BMP ship with Java SE). Decodes to
    * per-pixel luminance (ITU-R 601 integer weights, row-major) so the
    * histogram/feature stage downstream is codec-agnostic. Not the
    * default — the synthetic corpus payloads are UTF-8 text, which is not
    * a decodable image; select with `graft.multimodal.codec=imageio` on a
    * corpus of real image bytes. */
  object ImageIoCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Array[Int] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "ImageIoCodec: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** A REAL audio decoder on the same seam, also JDK-only: `javax.sound`
    * parses the WAV/PCM container, frames fold to mono, and each signed
    * 16-bit sample quantizes into the seam's [0, 255] range
    * ((s >> 8) + 128) — so downstream feature extraction (histogram, RMS
    * proxies) is codec-agnostic across image pixels and audio samples.
    * Rejects non-PCM/non-16-bit payloads loudly rather than guessing. */
  object WavCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Array[Int] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16,
          s"WavCodec supports 16-bit signed PCM only, got $fmt")
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val be = fmt.isBigEndian
        val nFrames = bytes.length / (2 * ch)
        val out = new Array[Int](nFrames)
        var i = 0
        while (i < nFrames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val s =
              if (be) (bytes(off) << 8) | (bytes(off + 1) & 0xFF)
              else (bytes(off + 1) << 8) | (bytes(off) & 0xFF)
            acc += s
            c += 1
          }
          out(i) = ((acc / ch) >> 8) + 128
          i += 1
        }
        out
      } finally in.close()
    }
  }

  /** Derive a deterministic media table from `documents` (payload = utf-8
    * text bytes; type round-robins by doc_id). Real pipelines read these
    * columns straight from parquet/lance — the point is the column model. */
  def mediaTable(spark: SparkSession, d: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        (pmod(col("doc_id"), lit(120)) + 1).cast("int").as("n_frames"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  /** The batched decode → resize → frame-sample → feature-extract stage.
    * `mapPartitions` so per-batch codec state is initialized once per
    * partition (the mapInPandas batch shape), not once per row. */
  def extractFeatures(media: Dataset[MediaRecord], maxSide: Int = 32,
      frameStride: Int = 10, codecName: String = "fake"): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition codec init: the NAME crossed the closure boundary;
      // the instance (and any native state a real codec opens) resolves
      // here, once per partition.
      val codec = MediaCodec.forName(codecName)
      rows.map { r =>
        val samples = codec.decode(r.payload)
        val (ow, oh) = codec.resizedDims(r.width, r.height, maxSide)
        val frames = r.media_type match {
          case "video" => (0 until r.n_frames by frameStride).toArray
          case _ => Array.empty[Int]
        }
        val hist = new Array[Long](16)
        samples.foreach(s => hist(s / 16) += 1)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          ow, oh, frames, hist)
      }
    }
  }

  /** q_multimodal: end-to-end plumbing — derive media, batch-extract,
    * summarize per type. The decode runs as the real batched
    * `mapPartitions` stage; because the stub codec is deterministic
    * arithmetic over the payload bytes (and the corpus is ASCII, so bytes =
    * chars), the summary is replayable in SQL — the DuckDB oracle below
    * recomputes byte length, frame-sample count, resize dims, and the
    * histogram-bin-7 population without ever touching the codec path. */
  def qMultimodal(spark: SparkSession, d: String): DataFrame = {
    val codecName = spark.conf.get(MediaCodec.CodecKey, "fake")
    // Fail fast on the driver: a typo'd codec name should be an immediate
    // IllegalArgumentException here, not a task failure deep inside
    // mapPartitions. The instance is discarded — executors still resolve
    // by name per partition.
    MediaCodec.forName(codecName)
    val feats = extractFeatures(mediaTable(spark, d), codecName = codecName)
    feats.toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(size(col("sampled_frames"))).cast("long").as("total_sampled_frames"),
        max(col("out_width")).as("max_out_width"),
        sum(element_at(col("histogram"), 8)).as("hist_bin7_total"))
      .orderBy(col("media_type"))
  }

  /** DuckDB replay of the fake-codec arithmetic (`strlen` = bytes;
    * `[\x70-\x7F]` = histogram bin 7 of single-byte chars; resize/frame
    * formulas inlined from [[FakeCodec]] / [[mediaTable]]). */
  val oracles: Map[String, String] = Map(
    "q_multimodal" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    strlen(text) AS n_bytes,
        |    CAST(doc_id % 64 + 16 AS INT) AS w,
        |    CAST(doc_id % 48 + 16 AS INT) AS h,
        |    CAST(doc_id % 120 + 1 AS INT) AS n_frames,
        |    strlen(text) - strlen(regexp_replace(text, '[\x70-\x7F]', '', 'g')) AS hist7
        |  FROM documents),
        |f AS (
        |  SELECT media_type, n_bytes, hist7,
        |    CASE WHEN media_type = 'video' THEN (n_frames + 9) // 10 ELSE 0 END AS n_sampled,
        |    CASE WHEN w <= 32 AND h <= 32 THEN w
        |         ELSE greatest(1, CAST(trunc(w * (32.0 / greatest(w, h))) AS INT)) END AS out_width
        |  FROM m)
        |SELECT media_type, count(*) AS n_docs,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(n_sampled) AS BIGINT) AS total_sampled_frames,
        |  max(out_width) AS max_out_width,
        |  CAST(sum(hist7) AS BIGINT) AS hist_bin7_total
        |FROM f GROUP BY media_type ORDER BY media_type""".stripMargin,
  )
}
