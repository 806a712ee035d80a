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
  * PNG/JPEG payloads decode for REAL through the JDK's ImageIO,
  * WAV/AIFF audio headers through `javax.sound.sampled.AudioSystem`,
  * and compressed-media METADATA through pure-JDK byte parsing of the
  * published container layouts — mp3 sync-frame headers (sample rate,
  * channels, PCM duration; ISO 11172-3) and mp4 ftyp/moov/mvhd/tkhd
  * boxes (duration, pixel dims; ISO 14496-12) — magic-byte dispatch in
  * `Decoder`. Only payload DECODE of compressed media falls back to
  * the deterministic `DecodeStub` — this container ships no codec
  * libraries. Everything around the seam is real and load-bearing:
  * schema, null handling, partition batching, output shape. Swapping
  * the stub fallback for javacv/ffmpeg is the only change needed on a
  * real cluster.
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
    * PNG/JPEG/GIF/BMP payloads (detected by magic bytes) go through
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

    private def isGif(b: Array[Byte]): Boolean =
      b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

    private def isBmp(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'B' && b(1) == 'M' && bmpDimsSane(b)

    /** 'BM' is only a 2-byte magic — any text starting "BM…" would
      * route to ImageIO, whose BMP reader ALLOCATES by the header's
      * unvalidated 4-byte dims (an OutOfMemoryError no NonFatal catch
      * covers — it would kill the task, not drop the row). Gate on
      * the declared dims being plausibly image-sized; insane headers
      * go to the stub like any other non-image payload.
      */
    private def bmpDimsSane(b: Array[Byte]): Boolean = {
      if (b.length < 26) return false
      def i32(o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      val w = i32(18)
      val h = math.abs(i32(22)) // negative height = top-down BMP, legal
      w > 0 && h > 0 && w <= 32768 && h <= 32768 &&
        w.toLong * h <= (64L << 20)
    }

    /** TIFF magic: `II*\0` (little-endian) or `MM\0*` (big-endian) —
      * the JDK bundles a TIFF ImageIO plugin since Java 9, so these
      * decode for REAL like PNG/JPEG (multi-page TIFFs report their
      * true page count as nFrames, the GIF animation treatment).
      */
    private def isTiff(b: Array[Byte]): Boolean =
      b.length >= 4 &&
        ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a && b(3) == 0) ||
          (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 0x2a))

    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    private def isAiff(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
        b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
        (b(11) == 'F' || b(11) == 'C')

    /** Sun AU (`.snd` magic) — the third PCM container the JDK's
      * sampled-audio stack decodes natively.
      */
    private def isAu(b: Array[Byte]): Boolean =
      b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'

    private def meanByte(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length

    private def isMp3(b: Array[Byte]): Boolean =
      (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)

    private def isMp4(b: Array[Byte]): Boolean =
      b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    /** MPEG audio (mp3) frame-header walk — pure byte parsing, no
      * codec: sample rate / channel mode / samples-per-frame come from
      * each 4-byte sync header, frame lengths chain one header to the
      * next (ISO 11172-3 public layout). METADATA only; the payload is
      * never decoded. Returns (sampleRate, channels, totalSampleFrames)
      * or None when fewer than 2 chained valid frames exist — a text
      * payload that happens to start with "ID3" must fall to the stub,
      * not masquerade as audio.
      */
    private[multimodal] def mp3Header(b: Array[Byte]): Option[(Int, Int, Int)] = {
      // skip an ID3v2 tag: 10-byte header, syncsafe 28-bit size
      var off =
        if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
          10 + ((b(6) & 0x7f) << 21 | (b(7) & 0x7f) << 14 |
            (b(8) & 0x7f) << 7 | (b(9) & 0x7f))
        else 0
      if (off < 0 || off >= b.length) return None
      val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320, 0)
      val BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
        96, 112, 128, 144, 160, 0)
      val SampleRateV1 = Array(44100, 48000, 32000, 0)
      var frames = 0
      var sampleFrames = 0L
      var rate = 0
      var channels = 0
      // Xing/Info VBR header (public layout, shipped by LAME/Xing
      // encoders): the FIRST frame's payload may carry a 'Xing' (VBR)
      // or 'Info' (CBR) tag at the fixed post-side-info offset, with a
      // flags word whose bit 0 announces a 4-byte total-frame count.
      // When present it is authoritative: the count covers the AUDIO
      // frames that follow, so the metadata frame itself no longer
      // inflates the duration the way a raw frame walk does.
      var xingFrames = -1L
      var xingSpf = 0
      var ok = true
      while (ok && off + 4 <= b.length) {
        val h = (b(off) & 0xff) << 24 | (b(off + 1) & 0xff) << 16 |
          (b(off + 2) & 0xff) << 8 | (b(off + 3) & 0xff)
        val sync = (h >>> 21) == 0x7ff
        val verBits = (h >>> 19) & 3      // 0=MPEG2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (h >>> 17) & 3    // 1=Layer III
        val brIdx = (h >>> 12) & 0xf
        val srIdx = (h >>> 10) & 3
        val padding = (h >>> 9) & 1
        val mode = (h >>> 6) & 3          // 3=mono
        if (!sync || verBits == 1 || layerBits != 1 || brIdx == 0 ||
            brIdx == 15 || srIdx == 3) ok = false
        else {
          val mpeg1 = verBits == 3
          val kbps = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
          val sr = verBits match {
            case 3 => SampleRateV1(srIdx)       // MPEG1
            case 2 => SampleRateV1(srIdx) / 2   // MPEG2
            case _ => SampleRateV1(srIdx) / 4   // MPEG2.5
          }
          val spf = if (mpeg1) 1152 else 576    // Layer III samples/frame
          val len = spf / 8 * (kbps * 1000) / sr + padding
          if (len <= 4) ok = false
          else {
            if (frames == 0) {
              // side-info size (ISO 11172-3): MPEG1 mono 17 / else 32;
              // MPEG2(.5) mono 9 / else 17 — the tag sits right after
              val side =
                if (mpeg1) { if (mode == 3) 17 else 32 }
                else { if (mode == 3) 9 else 17 }
              val t = off + 4 + side
              if (t + 12 <= b.length &&
                  ((b(t) == 'X' && b(t + 1) == 'i' && b(t + 2) == 'n' &&
                    b(t + 3) == 'g') ||
                   (b(t) == 'I' && b(t + 1) == 'n' && b(t + 2) == 'f' &&
                    b(t + 3) == 'o'))) {
                val flags = (b(t + 4) & 0xffL) << 24 | (b(t + 5) & 0xffL) << 16 |
                  (b(t + 6) & 0xffL) << 8 | (b(t + 7) & 0xffL)
                if ((flags & 1L) != 0) {
                  xingFrames = (b(t + 8) & 0xffL) << 24 |
                    (b(t + 9) & 0xffL) << 16 |
                    (b(t + 10) & 0xffL) << 8 | (b(t + 11) & 0xffL)
                  xingSpf = spf
                }
              }
            }
            frames += 1
            sampleFrames += spf
            rate = sr
            channels = if (mode == 3) 1 else 2
            off += len
          }
        }
      }
      // ≥2 chained frames, and the walk must have consumed the buffer
      // (a truncated/garbage tail means this was never an mp3 stream).
      // With a Xing/Info frame count the duration is exact-by-spec:
      // count × samples-per-frame, the metadata frame excluded.
      if (frames >= 2 && off >= b.length) {
        val total =
          if (xingFrames >= 0) xingFrames * xingSpf else sampleFrames
        Some((rate, channels, total.min(Int.MaxValue).toInt))
      } else None
    }

    /** ISO-BMFF (mp4) box walk — ftyp/moov/mvhd (+ the first video
      * trak's tkhd for pixel dims), pure byte parsing of the published
      * box layout (ISO 14496-12). METADATA only. Returns
      * (width, height, durationMs) or None on any malformed box.
      */
    private[multimodal] def mp4Header(b: Array[Byte]): Option[(Int, Int, Int)] = {
      def u32(o: Int): Long =
        (b(o) & 0xffL) << 24 | (b(o + 1) & 0xffL) << 16 |
          (b(o + 2) & 0xffL) << 8 | (b(o + 3) & 0xffL)
      def u64(o: Int): Long =
        u32(o) << 32 | u32(o + 4)
      def boxType(o: Int): String =
        new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // walk the sibling boxes of [from, until), returning the body
      // range of the first box of the wanted type
      def find(from: Int, until: Int, want: String): Option[(Int, Int)] = {
        var o = from
        while (o + 8 <= until) {
          val size0 = u32(o)
          val (size, hdr) =
            if (size0 == 1 && o + 16 <= until) (u64(o + 8), 16)
            else (size0, 8)
          if (size < hdr || o + size > until) return None
          if (boxType(o) == want) return Some((o + hdr, o + size.toInt))
          o += size.toInt
        }
        None
      }
      try {
        val moov = find(0, b.length, "moov").getOrElse(return None)
        val (mo, mu) = moov
        val (vo, vu) = find(mo, mu, "mvhd").getOrElse(return None)
        val version = b(vo) & 0xff
        val (timescale, duration) =
          if (version == 1) (u32(vo + 20), u64(vo + 24))
          else (u32(vo + 12), u32(vo + 16))
        if (timescale == 0) return None
        val durMs = duration * 1000L / timescale
        // first trak's tkhd carries 16.16 fixed-point pixel dims
        val dims = find(mo, mu, "trak").flatMap { case (to, tu) =>
          find(to, tu, "tkhd").map { case (ko, _) =>
            val v = b(ko) & 0xff
            val base = if (v == 1) ko + 4 + 8 + 8 + 4 + 4 + 8 else ko + 4 + 4 + 4 + 4 + 4 + 4
            val w = (u32(base + 8 + 2 + 2 + 2 + 2 + 36) >> 16).toInt
            val h = (u32(base + 8 + 2 + 2 + 2 + 2 + 36 + 4) >> 16).toInt
            (w, h)
          }
        }.getOrElse((0, 0))
        Some((dims._1, dims._2, durMs.min(Int.MaxValue).toInt))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
      if (isMp3(bytes)) {
        // header-real compressed audio: width = sample rate, height =
        // channels, nFrames = PCM sample frames (the WAV mapping)
        mp3Header(bytes) match {
          case Some((sr, ch, sf)) => MediaMeta(docId, kind = "audio",
            width = sr, height = ch, nFrames = sf,
            nBytes = bytes.length.toLong, meanByte = meanByte(bytes))
          case None => DecodeStub.decode(docId, bytes)
        }
      } else if (isMp4(bytes)) {
        // header-real video container: width/height = tkhd pixel dims
        // (0 when absent), nFrames carries mvhd duration in MILLIS —
        // without a codec there is no frame count, and duration is
        // the quantity a pipeline filters on
        mp4Header(bytes) match {
          case Some((w, h, durMs)) => MediaMeta(docId, kind = "video",
            width = w, height = h, nFrames = durMs,
            nBytes = bytes.length.toLong, meanByte = meanByte(bytes))
          case None => DecodeStub.decode(docId, bytes)
        }
      } else if (isWav(bytes) || isAiff(bytes) || isAu(bytes)) {
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
      } else if (isPng(bytes) || isJpeg(bytes) || isGif(bytes) ||
          isBmp(bytes) || isTiff(bytes)) {
        // NonFatal, not just IOException: the JDK decoders throw
        // IllegalArgument/NegativeArraySize/IndexOutOfBounds on
        // crafted or truncated headers, and one bad document must not
        // fail the whole decode job
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) DecodeStub.decode(docId, bytes) // corrupt payload → stub
        else MediaMeta(docId, kind = "image",
          width = img.getWidth, height = img.getHeight,
          // multi-frame formats (animated GIF, multi-page TIFF) report
          // their true frame/page count — the quantity a size gate
          // filters on
          nFrames =
            if (isGif(bytes) || isTiff(bytes)) imageFrameCount(bytes) else 1,
          nBytes = bytes.length.toLong, meanByte = meanByte(bytes))
      } else DecodeStub.decode(docId, bytes)

    /** Real frame/page count for multi-image formats (animated GIF,
      * multi-page TIFF) via the matching ImageIO reader —
      * `ImageIO.read` decodes only the first frame, and reporting
      * nFrames = 1 for a 50-frame animation would understate exactly
      * the quantity a duration/size gate filters on.
      */
    private def imageFrameCount(bytes: Array[Byte]): Int =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) 1
          else {
            val r = readers.next()
            try { r.setInput(iis); math.max(r.getNumImages(true), 1) }
            finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => 1 }
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

  /** Audio feature row: signal-level statistics from the DECODED PCM
    * payload — the audio sibling of [[ImageFeatures]], and the
    * pipeline seam where a real deployment plugs an audio encoder.
    */
  case class AudioFeatures(
      docId: Long, nSamples: Long, rms: Double, peak: Double, zcr: Double)

  /** REAL audio payload decode for WAV/AIFF PCM (the formats the JDK
    * decodes without codec jars — this is where the "payload decode
    * is stubbed" seam genuinely shrinks): channel-0 samples stream
    * through one pass accumulating integer sums, yielding RMS level,
    * peak amplitude (both normalized to [0, 1] full scale), and
    * zero-crossing rate — the classic cheap speech/music/silence
    * discriminators a corpus-gating pipeline filters on. Integer
    * accumulation (sum of squared 16-bit samples in a long), one
    * division + sqrt at the end — deterministic on any partitioning
    * and JVM. Non-PCM or undecodable payloads drop (the
    * crafted-header rule shared with the image paths); every PCM
    * width (8/16/24/32-bit) quantizes to 16 bits before accumulation
    * so the normalization is uniform and the squared sums cannot
    * overflow a long.
    */
  def audioFeatures(binaries: DataFrame): Dataset[AudioFeatures] = {
    val enc = Encoders.product[AudioFeatures]
    binaries
      .select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else {
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                import javax.sound.sampled.AudioFormat.Encoding._
                val fmt = in.getFormat
                val bits = fmt.getSampleSizeInBits
                // every PCM width the WAV/AIFF world ships (8 through
                // 32, incl. the 24-bit studio standard) — anything
                // else (float PCM, A-law...) is genuinely non-PCM here
                val ok =
                  (fmt.getEncoding == PCM_SIGNED &&
                    Seq(8, 16, 24, 32).contains(bits)) ||
                    (fmt.getEncoding == PCM_UNSIGNED && bits == 8)
                if (!ok || fmt.getFrameSize <= 0) None
                else {
                  val data = in.readAllBytes()
                  val fs = fmt.getFrameSize
                  val big = fmt.isBigEndian
                  val w = (bits + 7) / 8
                  val unsigned8 = fmt.getEncoding == PCM_UNSIGNED
                  val n = data.length / fs
                  var i = 0
                  var sumSq = 0L
                  var peak = 0L
                  var crossings = 0L
                  var prevNonNeg = true
                  var first = true
                  while (i < n) {
                    val o = i * fs
                    // assemble the channel-0 sample, sign-extend from
                    // its true width, then quantize to 16 bits so the
                    // integer accumulation (and the [0,1] norms) are
                    // uniform across widths
                    var v = 0
                    if (big) {
                      var j = 0
                      while (j < w) { v = (v << 8) | (data(o + j) & 0xff); j += 1 }
                    } else {
                      var j = w - 1
                      while (j >= 0) { v = (v << 8) | (data(o + j) & 0xff); j -= 1 }
                    }
                    val s: Int =
                      if (unsigned8) ((v & 0xff) - 128) << 8
                      else {
                        val sh = 32 - w * 8
                        val full = (v << sh) >> sh
                        if (bits >= 16) full >> (bits - 16)
                        else full << (16 - bits)
                      }
                    sumSq += s.toLong * s
                    val a = math.abs(s.toLong)
                    if (a > peak) peak = a
                    val nonNeg = s >= 0
                    if (!first && nonNeg != prevNonNeg) crossings += 1
                    prevNonNeg = nonNeg
                    first = false
                    i += 1
                  }
                  if (n == 0) None
                  else Some(AudioFeatures(id, n,
                    math.sqrt(sumSq.toDouble / n) / 32768.0,
                    peak / 32768.0,
                    crossings.toDouble / math.max(n - 1, 1)))
                }
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => None }
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
