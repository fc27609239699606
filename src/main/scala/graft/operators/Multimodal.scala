package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns + a typed metadata struct —
  * the Spark-native layout for 100 TB multimodal corpora (payload stays in
  * parquet/columnar storage, metadata prunes without touching bytes).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) needs
  * native libraries that are NOT in this container — those steps are
  * STUBBED with deterministic fakes, clearly marked below. Everything
  * around them (schema, batching, partition behavior, pipeline shape) is
  * real and tested.
  */
object Multimodal {

  /** Canonical media metadata struct carried alongside every payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // jpeg|png|wav|mp4|...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType),
    StructField("size_bytes", LongType)))

  /** Wrap a raw binary column into the canonical (payload, meta) pair. */
  def asMedia(payload: Column, mediaType: String, format: String): Column =
    struct(
      payload.as("payload"),
      struct(
        lit(mediaType).as("media_type"), lit(format).as("format"),
        lit(null).cast(IntegerType).as("width"), lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"), lit(null).cast(IntegerType).as("sample_rate"),
        length(payload).cast(LongType).as("size_bytes")).as("meta"))

  // ------------------------------------------------------------------ STUBS
  // STUB: real implementations require image/audio codecs absent from this
  // container. Each fake is deterministic (derived from the payload bytes
  // via md5, which every oracle engine also implements — so even the stub
  // outputs are cross-engine verifiable) so the distributed plumbing is
  // fully testable end-to-end.

  /** REAL image-header probe (round 6): parses PNG IHDR, GIF screen
    * descriptor, BMP info header, and the JPEG SOF marker walk directly
    * from the payload bytes — no codec library involved, so this part of
    * the decode story is genuine even in this container. Returns
    * struct(width, height, format); null when no signature matches.
    * Codegen'd custom expression; also SQL-registered as `image_header`. */
  def imageHeader(payload: Column): Column = graft.exts.exprs.imageHeader(payload)

  /** REAL WAV/RIFF audio-header probe (round 6): sample rate, channels,
    * bits, and data-chunk-derived duration from the raw header bytes —
    * the audio sibling of [[imageHeader]]. SQL: `audio_header`. */
  def audioHeader(payload: Column): Column = graft.exts.exprs.audioHeader(payload)

  /** STUB image decode → (width, height, channels) header probe. A real
    * implementation parses the format header (pure-JVM for JPEG/PNG —
    * that part is now REAL in [[imageHeader]]; this md5 fake remains for
    * the oracle-checked q72 plumbing over synthetic payloads). */
  def probeImageDims(payload: Column): Column = struct(
    (pmod(Dedup.md5Hash28(payload), lit(1920L)) + 1L).cast(IntegerType).as("width"),
    (pmod(Dedup.md5Hash28(concat(payload, lit("h").cast(BinaryType))), lit(1080L)) + 1L)
      .cast(IntegerType).as("height"),
    lit(3).as("channels"))

  /** STUB perceptual hash (would be DCT over decoded pixels); here a
    * deterministic md5-derived 64-bit digest so dedup-by-phash plumbing
    * runs (and oracles can reproduce it). */
  def perceptualHash(payload: Column): Column = Dedup.md5Hash64(payload)

  /** STUB feature extraction via mapPartitions-shaped batching: returns a
    * fixed-length float vector derived deterministically from the bytes.
    * The real path swaps `fakeEmbed` for an ONNX/JNI batch call — the
    * batching, schema, and partitioning stay identical. */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int = 8): DataFrame = {
    val fakeEmbed = transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(Dedup.md5Hash28(concat(col(payloadCol), i.cast(StringType).cast(BinaryType))),
        lit(1000L)).cast("double") / 500.0) - 1.0)
    df.withColumn("features", fakeEmbed)
  }

  /** Batched feature extraction through `mapPartitions` — the Scala
    * analogue of the reference's `mapInPandas` path (SURVEY.md §2.4 UDF
    * surface): rows stream through in `batchSize` groups, ONE model
    * invocation per batch (amortizing JNI/ONNX call overhead), iterator-in/
    * iterator-out so no partition is materialized in memory. STUB: the
    * per-batch "model" is a deterministic murmur-hash embedding; a real
    * deployment swaps only the `embedBatch` body. */
  def extractFeaturesBatched(df: DataFrame, payloadCol: String,
      dim: Int = 8, batchSize: Int = 64, outputCol: String = "features"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    require(!df.columns.contains(outputCol), s"column $outputCol already exists")
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, ArrayType(FloatType, containsNull = false), nullable = false))

    // STUB model call: batch of payloads -> batch of embeddings. Same
    // md5-derived formula as extractFeatures so the two code paths (pure
    // expression vs mapPartitions batch) are mutually checkable AND both
    // reproducible by an md5-capable oracle engine.
    def embedBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { bytes =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        Array.tabulate(dim) { i =>
          digest.reset()
          digest.update(bytes)
          digest.update(i.toString.getBytes("UTF-8"))
          val hex = digest.digest().take(4).map(b => f"${b & 0xff}%02x").mkString.take(7)
          val h = java.lang.Long.parseLong(hex, 16)
          ((h % 1000L) / 500.0 - 1.0).toFloat
        }
      }

    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = embedBatch(batch.map(_.getAs[Array[Byte]](idx)))
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f.toSeq))
      }
    }(Encoders.row(outSchema))
  }

  /** STUB video frame sampling: emits (frame_idx, frame_payload) rows every
    * `everyMs`. Real impl: container demux per partition; here frames are
    * byte-slices so the explode/partition shape is real. */
  def sampleFrames(df: DataFrame, payloadCol: String, durationMsCol: String, everyMs: Long): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0L), greatest((col(durationMsCol) / everyMs).cast("long") - 1, lit(0L)))))
      .withColumn("frame_payload",
        col(payloadCol).substr((col("frame_idx") * 16 + 1).cast("int"), lit(16)))
}
