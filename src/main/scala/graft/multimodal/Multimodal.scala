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
  * PNG/JPEG payloads decode for REAL through the JDK's ImageIO, and
  * WAV/AIFF audio headers through `javax.sound.sampled.AudioSystem`
  * (magic byte dispatch in `Decoder`); only compressed audio and video
  * containers fall back to the deterministic `DecodeStub` — this
  * container ships no mp3/video codec libraries. Everything around the
  * seam is real and load-bearing: schema, null handling, partition
  * batching, output shape. Swapping the stub fallback for
  * javacv/ffmpeg is the only change needed on a real cluster.
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

  /** Dispatching decoder: REAL codec for what the JDK can decode,
    * deterministic stub for everything else.
    *
    * PNG/JPEG payloads (detected by magic bytes) go through
    * `javax.imageio.ImageIO` and report true pixel dimensions; WAV and
    * AIFF payloads go through `javax.sound.sampled.AudioSystem` and
    * report true sample rate / channels / frame count; remaining
    * payloads (compressed audio, video containers — no codec libs in
    * this container) fall back to `DecodeStub`'s deterministic fake. A
    * real cluster swaps the fallback for javacv/ffmpeg; the
    * ImageIO/AudioSystem branches show the seam working end-to-end
    * with actual codecs.
    */
  object Decoder {
    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && (b(4) & 0xff) == 0x0d &&
        (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a

    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff

    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    private def isAiff(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
        b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
        (b(11) == 'F' || b(11) == 'C')

    private def meanByte(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length

    def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
      if (isWav(bytes) || isAiff(bytes)) {
        // real audio header decode via the JDK's sampled-audio stack;
        // MediaMeta's pixel fields carry the audio analogs (documented
        // mapping): width = sample rate in Hz, height = channel count,
        // nFrames = sample frames
        val fmt =
          try javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (fmt == null) DecodeStub.decode(docId, bytes) // corrupt header → stub
        else MediaMeta(docId, kind = "audio",
          width = fmt.getFormat.getSampleRate.toInt,
          height = fmt.getFormat.getChannels,
          nFrames = math.max(fmt.getFrameLength, 0), // NOT_SPECIFIED = -1 → 0
          nBytes = bytes.length.toLong, meanByte = meanByte(bytes))
      } else if (isPng(bytes) || isJpeg(bytes)) {
        // NonFatal, not just IOException: the JDK decoders throw
        // IllegalArgument/NegativeArraySize/IndexOutOfBounds on
        // crafted or truncated headers, and one bad document must not
        // fail the whole decode job
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) DecodeStub.decode(docId, bytes) // corrupt payload → stub
        else MediaMeta(docId, kind = "image",
          width = img.getWidth, height = img.getHeight, nFrames = 1,
          nBytes = bytes.length.toLong, meanByte = meanByte(bytes))
      } else DecodeStub.decode(docId, bytes)
  }

  /** STUB decoder ("???" seam) for payloads the JDK cannot decode
    * (compressed audio, video containers): a real implementation would
    * hand `bytes` to an audio/video codec.
    * The fake is deterministic: kind from the first UTF-8 CODE POINT
    * (not byte) % 3 — matching what SQL `ascii(substr(text, 1, 1))`
    * sees, so the oracle agrees for non-ASCII payloads too — and dims
    * from the next bytes, so tests can assert exact outputs.
    */
  object DecodeStub {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      // ??? real codec goes here (e.g. ffmpeg frame grab)
      // first code point: the leading UTF-8 sequence is ≤ 4 bytes;
      // malformed input decodes to U+FFFD, still deterministic
      val cp =
        if (bytes.isEmpty) 0
        else new String(bytes.take(4), java.nio.charset.StandardCharsets.UTF_8)
          .codePointAt(0)
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val b2 = if (bytes.length > 2) bytes(2) & 0xff else 0
      val kind = (cp % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
      MediaMeta(docId, kind, width = 16 + b1, height = 16 + b2,
        nFrames = if (kind == "video") 1 + cp % 8 else 1,
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
          Decoder.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }(enc)
  }

  /** Resized image output row. */
  case class ResizedImage(
      docId: Long, content: Array[Byte], width: Int, height: Int)

  /** REAL image resize (the resolution-normalization step ahead of
    * feature extraction): PNG/JPEG payloads decode through ImageIO,
    * scale to `(w, h)` with nearest-neighbor interpolation (chosen
    * because it is bit-DETERMINISTIC across JVMs — bilinear goes
    * through platform-variant float paths), and re-encode as PNG.
    * Non-image payloads drop (the caller filters kinds upstream, the
    * same contract as sampleFrames). Same mapPartitions shape as
    * decodeMeta: narrow map, bytes never shuffle, per-partition init
    * seam for a real codec context.
    */
  def resizeImages(binaries: DataFrame, w: Int, h: Int): Dataset[ResizedImage] = {
    val enc = Encoders.product[ResizedImage]
    binaries
      .select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            // NonFatal, not just IOException — the same crafted-header
            // rule as decodeMeta: one bad payload drops, not the job
            val img = try {
              Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
            } catch { case scala.util.control.NonFatal(_) => None }
            img.map { src =>
              val dst = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
                g.drawImage(src, 0, 0, w, h, null)
              } finally g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              ResizedImage(id, out.toByteArray, w, h)
            }
          }
        }
      }(enc)
  }

  /** Image feature row: a per-channel color histogram, the classic
    * pre-neural visual feature (and the pipeline seam where a real
    * deployment plugs a vision encoder — same shape: binary in,
    * fixed-width vector out).
    */
  case class ImageFeatures(docId: Long, features: Array[Double])

  /** REAL feature extraction for PNG/JPEG payloads: 3 × `bins`
    * normalized RGB histograms via ImageIO (integer bin counts, one
    * final division per bin — deterministic across JVMs). Non-image
    * payloads drop. The output vector column feeds the similarity
    * stack directly (cosine top-k, LSH, IVF/PQ indexes — an
    * embedding is an embedding).
    */
  def imageFeatures(binaries: DataFrame, bins: Int = 8): Dataset[ImageFeatures] = {
    val enc = Encoders.product[ImageFeatures]
    binaries
      .select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            // NonFatal, not just IOException — the same crafted-header
            // rule as decodeMeta: one bad payload drops, not the job
            val img = try {
              Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
            } catch { case scala.util.control.NonFatal(_) => None }
            img.map { src =>
              val counts = new Array[Long](3 * bins)
              var y = 0
              while (y < src.getHeight) {
                var x = 0
                while (x < src.getWidth) {
                  val rgb = src.getRGB(x, y)
                  counts(((rgb >> 16) & 0xff) * bins / 256) += 1L
                  counts(bins + ((rgb >> 8) & 0xff) * bins / 256) += 1L
                  counts(2 * bins + (rgb & 0xff) * bins / 256) += 1L
                  x += 1
                }
                y += 1
              }
              val n = (src.getWidth.toLong * src.getHeight).toDouble
              ImageFeatures(id, counts.map(_ / n))
            }
          }
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
