package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE north star).
  *
  * Media travel as opaque `binary` columns next to typed metadata. The
  * Spark-side plumbing — schema, partition sizing, per-partition batched
  * decode, feature schema — is real and tested; the codec itself is a
  * clearly-marked deterministic STUB because no image/audio libraries exist
  * in this container (swap `decodeBytes` for a real JNI/library call; the
  * dataflow does not change).
  *
  * Scale design: decode runs as `mapPartitions` so a real codec amortizes
  * per-partition init (model load, library handles) exactly like a Pandas-UDF
  * batch would; binary payloads never pass through a shuffle — featurize
  * first, shuffle the (small) features.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_format", StringType, nullable = true)))

  /** Decoded-feature schema produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("checksum", LongType, nullable = false)))

  /** STUB CODEC — deterministic fake decode standing in for a real image/
    * audio decoder (???-equivalent; see object Scaladoc). Features derive
    * from the first 60 bits of the payload's md5 (positive, no wrapping
    * arithmetic), so the stub has an exact SQL twin and the decode stage is
    * oracle-verifiable end-to-end. */
  private[llm] def decodeBytes(digest: java.security.MessageDigest,
      payload: Array[Byte]): (Int, Int, Int, Long) = {
    digest.reset()
    val hex = String.format("%032x",
      new java.math.BigInteger(1, digest.digest(payload)))
    val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val width = 64 + (checksum % 1024).toInt
    val height = 64 + ((checksum >> 10) % 1024).toInt
    (width, height, 3, checksum)
  }

  /** Decode/feature-extract stage: binary payloads → feature rows.
    * Runs per-partition so a real codec initializes once per partition
    * (here: one MessageDigest per partition, reset per record — the same
    * amortization a real model/library handle needs). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val (w, h, c, sum) = decodeBytes(digest, payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            payload.length, w, h, c, sum)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame-sampling plumbing for video-like payloads: split a payload into
    * fixed-size frames, keep every `stride`-th — all expression-level
    * (binary slicing with substr on binary works in Spark). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        floor(length(col("payload")) / lit(frameBytes)).cast(IntegerType))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_idx"), col("frame"))

  /** Resize planning: aspect-preserving letterbox geometry into a target
    * box — scale = min(W/w, H/h), output dims floored (≥1), symmetric
    * padding. The pixel resample itself belongs to the stubbed codec
    * (mapPartitions, like decode); the GEOMETRY is what the pipeline
    * schedules on and is pure arithmetic, verified cross-engine. */
  def resizePlan(features: DataFrame, targetW: Int, targetH: Int)
      : DataFrame =
    features
      .withColumn("scale", least(lit(targetW) / col("width"),
        lit(targetH) / col("height")))
      .withColumn("out_w", greatest(lit(1),
        floor(col("width") * col("scale"))).cast(IntegerType))
      .withColumn("out_h", greatest(lit(1),
        floor(col("height") * col("scale"))).cast(IntegerType))
      .withColumn("pad_x",
        ((lit(targetW) - col("out_w")) / lit(2)).cast(IntegerType))
      .withColumn("pad_y",
        ((lit(targetH) - col("out_h")) / lit(2)).cast(IntegerType))
      .drop("scale")

  /** Perceptual hash over media payloads: 64 equal byte-blocks per
    * payload, bit j = parity of block j's byte sum — a locality-preserving
    * (block-local edits flip few bits) stand-in for a real pHash's
    * DCT-mean bits, running where a real one would: inside the
    * mapPartitions decode stage, so payloads NEVER pass through a shuffle
    * — only the 64-bit hash and id leave the scan. Block bounds use
    * integer floor(j·n/64) arithmetic an oracle replays exactly.
    *
    * 64 bits is a SCALE decision, found by the 10× smoke: a 16-bit
    * variant saturates around 10⁴ items — accidental pairs within
    * hamming h grow as n²/2 · Σ_{k≤h} C(16,k)/2¹⁶ (≈ n²/188 at h=3,
    * 13.5 M junk pairs at 50 k docs; even exact collisions alone are
    * n²/2¹⁷ ≈ 19 k). At 64 bits the same sums are ≈ n²·2⁻⁵⁰ —
    * negligible at any corpus size this engine targets. */
  private[llm] def phashBytes(payload: Array[Byte]): Long = {
    val bytes = if (payload == null) Array.empty[Byte] else payload
    val n = bytes.length
    var hash = 0L
    var j = 0
    while (j < 64) {
      val from = (j.toLong * n / 64).toInt
      val until = ((j + 1).toLong * n / 64).toInt
      var s = 0L
      var i = from
      while (i < until) { s += bytes(i) & 0xff; i += 1 }
      if ((s & 1L) == 1L) hash |= (1L << j)
      j += 1
    }
    hash
  }

  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, phashBytes(payload)) })
      .toDF("media_id", "phash")
  }

  /** Per-frame perceptual hash over [[sampleFrames]] output: the same
    * 64-block parity bits computed on each FRAME payload — runs in the
    * decode mapPartitions stage class, so frame bytes never shuffle; only
    * (media_id, frame_idx, phash) leave the scan. */
  def framePhash(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("media_id"), col("frame_idx"), col("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, idx, payload) =>
        (id, idx, phashBytes(payload))
      }).toDF("media_id", "frame_idx", "phash")
  }

  /** Scene-cut detection (SURVEY §2D, D116): a cut is a consecutive-frame
    * perceptual-hash hamming distance above `threshold` — the standard
    * shot-boundary heuristic, running entirely on the 64-bit frame hashes
    * (one media-partitioned lag window; per-media state bounded by sampled
    * frames, video bytes never shuffle). The first frame of each media has
    * no predecessor: ham is NULL and cut = 0. */
  def sceneCuts(framePhashes: DataFrame, threshold: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    framePhashes
      .withColumn("prev", lag(col("phash"), 1).over(w))
      .withColumn("ham",
        expr("bit_count(prev ^ phash)").cast(IntegerType))
      .withColumn("cut",
        when(col("ham") > threshold, 1).otherwise(0))
  }

  /** Near-duplicate media pairs by perceptual-hash hamming distance:
    * 16-bit-chunk pigeonhole banding (hamming ≤ 3 ⇒ at least one of the 4
    * chunks matches) turns the all-pairs scan into a chunk-keyed
    * equi-join — the simhash banding discipline applied to media. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    // 4 chunks only guarantee a shared chunk for hamming <= 3 (pigeonhole:
    // h+1 chunks cover hamming h) — a larger threshold would silently
    // miss pairs whose diff bits spread one-per-chunk
    require(maxHamming <= 3,
      s"4-chunk banding covers hamming <= 3, got $maxHamming")
    val chunks = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(c => struct(lit(c).as("c"),
        shiftright(col("phash"), c * 16).bitwiseAND(lit(0xFFFFL))
          .as("v"))): _*))
        .as("ch"))
      .select(col("media_id"), col("phash"),
        col("ch.c").as("c"), col("ch.v").as("v"))
    val a = chunks.toDF("id1", "ph1", "c", "v")
    val b = chunks.toDF("id2", "ph2", "c", "v")
    a.join(b, Seq("c", "v")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        expr("bit_count(ph1 ^ ph2)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Wrap a text table as fake media payloads (UTF-8 bytes) — lets the full
    * multimodal path run against the `documents` testdata. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/fake").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("synthetic").as("meta_format"))

  /** Per-window audio feature rows produced by [[audioWindows]]. */
  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("window_idx", IntegerType, nullable = false),
    StructField("energy", IntegerType, nullable = false),
    StructField("is_silent", BooleanType, nullable = false)))

  /** Audio-analysis stage — the AUDIO member of the modality triple
    * (image: [[decodeFeatures]]/[[resizePlan]], video: [[sampleFrames]]/
    * scene cuts): the payload is a sample stream cut into `windows` equal
    * windows with a per-window ENERGY and a silence flag (energy below
    * `silenceFloor` — the voice-activity-detection shape every audio
    * corpus pipeline runs before transcription). The energy computation
    * is the stubbed codec (md5-derived, swap for a real RMS over decoded
    * PCM; see object Scaladoc) so the stage has an exact SQL twin; it
    * runs inside the SAME mapPartitions decode stage as the other
    * modalities — payloads never shuffle, only (id, window, energy, flag)
    * rows leave the scan. `windows` ≤ 8 keeps every derived energy inside
    * the checksum's 60 entropy bits. */
  def audioWindows(media: DataFrame, windows: Int = 8,
      silenceFloor: Int = 40): DataFrame = {
    require(windows >= 1 && windows <= 8, s"windows must be 1..8: $windows")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload"))
          .getOrElse(Array.emptyByteArray)
        val (_, _, _, sum) = decodeBytes(digest, payload)
        (0 until windows).map { w =>
          val e = ((sum >> (7 * w)) % 256).toInt
          Row(r.getAs[Long]("media_id"), w, e, e < silenceFloor)
        }
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }
}
