package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (BASELINE.json
  * north-star): media travel as opaque `binary` columns with typed
  * metadata structs; decode / feature-extract / resize / frame-sample
  * run as partition-batched transforms (the Scala analog of
  * `mapInPandas`: one iterator per partition, library handles
  * amortized per batch, arbitrary Scala inside).
  *
  * The actual codec call is STUBBED — this container ships no image/
  * audio libraries — behind `DecodeStub`, which parses a deterministic
  * fake header instead. Everything AROUND the stub is real and load-
  * bearing: schema, null handling, partition batching, output shape.
  * Swapping `DecodeStub.decode` for javacv/ffmpeg is the only change
  * needed on a real cluster.
  *
  * Scale notes: binary payloads stay columnar (parquet binary) and are
  * never collected; decode is a narrow map (no shuffle); downstream
  * aggregations group on the extracted metadata, not the bytes.
  */
object Multimodal {

  /** Typed metadata produced by decode. */
  case class MediaMeta(
      docId: Long,
      kind: String,
      width: Int,
      height: Int,
      nFrames: Int,
      nBytes: Long,
      meanByte: Double)

  /** STUB decoder ("???" seam): a real implementation would hand
    * `bytes` to an image/audio codec. The fake is deterministic:
    * kind from bytes(0) % 3, dims from the next bytes, so tests can
    * assert exact outputs.
    */
  object DecodeStub {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      // ??? real codec goes here (e.g. ImageIO.read / ffmpeg frame grab)
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val b2 = if (bytes.length > 2) bytes(2) & 0xff else 0
      val kind = (b0 % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
      MediaMeta(docId, kind, width = 16 + b1, height = 16 + b2,
        nFrames = if (kind == "video") 1 + b0 % 8 else 1,
        nBytes = bytes.length.toLong, meanByte = mean)
    }
  }

  /** Decode a (docId: Long, content: binary) DataFrame into typed
    * metadata via partition-batched iteration — the mapInPandas-shaped
    * plumbing: per-partition setup cost paid once (a real codec would
    * init its native context here), then streamed row batches.
    */
  def decodeMeta(binaries: DataFrame): Dataset[MediaMeta] = {
    val enc = Encoders.product[MediaMeta]
    binaries
      .select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        // per-partition init seam (native codec context, model weights…)
        rows.map { case (id, bytes) =>
          DecodeStub.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }(enc)
  }

  /** Frame sampling for video rows: explode n sampled frame indices
    * per video (stride sampling), keeping the lineage (docId, frame).
    * A real pipeline would then decode each (docId, frameIdx) pair.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyN: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("docId"), col("nFrames"),
        explode(sequence(lit(0), col("nFrames") - 1, lit(everyN)))
          .as("frameIdx"))

  /** Demo binary source: derive a binary payload column from document
    * text (the testdata carries no real media; the PLUMBING is what is
    * exercised — parquet binary columns, null-safe casts).
    */
  def binariesFromDocuments(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("content"))
}
