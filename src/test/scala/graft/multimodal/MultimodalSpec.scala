package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multimodal plumbing: binary round-trip, partition-batched decode
  * stub, typed metadata, frame sampling, null payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: deterministic typed metadata from binary column") {
    val df = Seq(
      (1L, "HELLO WORLD"), // 'H'=72, 72%3=0 → image
      (2L, "abc"),         // 'a'=97, 97%3=1 → audio
      (3L, "ha")           // 'h'=104, 104%3=2 → video
    ).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.binariesFromDocuments(df))
      .collect().sortBy(_.docId)
    assert(meta.map(_.kind).toSeq === Seq("image", "audio", "video"))
    assert(meta(0).nBytes === 11L)
    // dims derived from bytes 1 and 2: 16 + 'E'(69), 16 + 'L'(76)
    assert(meta(0).width === 16 + 69)
    assert(meta(0).height === 16 + 76)
    // meanByte exact: sum of codepoints / length
    assert(meta(1).meanByte === (97 + 98 + 99) / 3.0)
  }

  test("real PNG and JPEG payloads decode through ImageIO to true dims") {
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff0000)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val png = encode("png", 2, 2)
    val jpg = encode("jpg", 5, 3)
    val gif = encode("gif", 4, 6)
    val bmp = encode("bmp", 7, 2)
    val df = Seq((1L, png), (2L, jpg), (3L, gif), (4L, bmp))
      .toDF("doc_id", "content")
    val meta = Multimodal.decodeMeta(df).collect().sortBy(_.docId)
    assert(meta(0).kind === "image")
    assert((meta(0).width, meta(0).height) === (2, 2))
    assert(meta(0).nBytes === png.length.toLong)
    assert(meta(1).kind === "image")
    assert((meta(1).width, meta(1).height) === (5, 3))
    // GIF and BMP ride the same ImageIO branch (magic-dispatched)
    assert(meta(2).kind === "image")
    assert((meta(2).width, meta(2).height) === (4, 6))
    assert(meta(3).kind === "image")
    assert((meta(3).width, meta(3).height) === (7, 2))
    // non-image bytes with an image-ish first byte still go to the stub
    val stub = Multimodal.Decoder.decode(3L, "HELLO".getBytes("UTF-8"))
    assert(stub.width === 16 + 'E'.toInt)
  }

  test("real image resize: quadrant colors survive nearest-neighbor downscale") {
    // 4×4 PNG with four solid 2×2 quadrants → resize to 2×2 must keep
    // one representative pixel per quadrant (nearest-neighbor), and
    // the output must itself re-decode as a 2×2 PNG
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    for (x <- 0 until 4; y <- 0 until 4)
      img.setRGB(x, y, colors((y / 2) * 2 + (x / 2)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val df = Seq((1L, out.toByteArray), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "content")

    val resized = Multimodal.resizeImages(df, 2, 2).collect()
    assert(resized.length === 1) // the non-image row dropped
    val r = resized.head
    assert((r.docId, r.width, r.height) === (1L, 2, 2))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.content))
    assert((back.getWidth, back.getHeight) === (2, 2))
    val got = for (y <- 0 until 2; x <- 0 until 2)
      yield back.getRGB(x, y) & 0xffffff
    assert(got.toSet === colors.toSet)
  }

  test("real image features: RGB histograms normalize and localize") {
    // 2×2 solid red → all red mass in the TOP bin of the R channel,
    // all green/blue mass in bin 0 of their channels
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 2; y <- 0 until 2) img.setRGB(x, y, 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val df = Seq((1L, out.toByteArray)).toDF("doc_id", "content")

    val f = Multimodal.imageFeatures(df, bins = 4).collect().head.features
    assert(f.length === 12)
    assert(f(3) === 1.0)                 // R channel, top bin
    assert(f(4) === 1.0 && f(8) === 1.0) // G and B channels, bin 0
    assert(f.sum === 3.0)                // each channel normalizes to 1
  }

  test("real WAV and AIFF payloads decode through AudioSystem to true format") {
    def encode(fileType: javax.sound.sampled.AudioFileFormat.Type,
        sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true,
        fileType == javax.sound.sampled.AudioFileFormat.Type.AIFF) // AIFF is big-endian
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in, fileType, out)
      out.toByteArray
    }
    val wav = encode(javax.sound.sampled.AudioFileFormat.Type.WAVE, 8000f, 1, 1600)
    val aiff = encode(javax.sound.sampled.AudioFileFormat.Type.AIFF, 44100f, 2, 441)
    val au = encode(javax.sound.sampled.AudioFileFormat.Type.AU, 16000f, 1, 320)
    val df = Seq((1L, wav), (2L, aiff), (3L, au)).toDF("doc_id", "content")
    val meta = Multimodal.decodeMeta(df).collect().sortBy(_.docId)
    assert(meta(0).kind === "audio")
    // audio mapping: width = sample rate Hz, height = channels
    assert((meta(0).width, meta(0).height, meta(0).nFrames) === (8000, 1, 1600))
    assert(meta(0).nBytes === wav.length.toLong)
    assert(meta(1).kind === "audio")
    assert((meta(1).width, meta(1).height, meta(1).nFrames) === (44100, 2, 441))
    // Sun AU rides the same AudioSystem branch (.snd magic)
    assert(meta(2).kind === "audio")
    assert((meta(2).width, meta(2).height, meta(2).nFrames) === (16000, 1, 320))
    // a truncated RIFF header (magic only, no fmt chunk) falls back to
    // the stub instead of failing the decode job
    val corrupt = Multimodal.Decoder.decode(3L, "RIFFxxxxWAVE".getBytes("US-ASCII"))
    assert(corrupt.width === 16 + 'I'.toInt) // stub dims, not a throw
  }

  test("real audio PCM features: sine RMS/peak/ZCR from the decoded payload") {
    // 16-bit mono WAV, 1 kHz sine at half amplitude, sr = 8 kHz:
    // rms → A/√2, peak → A, zcr → 2·f/sr — textbook values the
    // extractor must recover from the BYTES, not the header
    val sr = 8000f
    val f = 1000.0
    val amp = 0.5
    val n = 8000
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (amp * 32767.0 *
        math.sin(2 * math.Pi * f * i / sr)).round.toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val silent = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](400)), fmt, 200L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, silent)

    val df = Seq(
      (1L, out.toByteArray), (2L, silent.toByteArray),
      (3L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val got = Multimodal.audioFeatures(df).collect()
      .map(a => a.docId -> a).toMap
    assert(got.keySet === Set(1L, 2L)) // undecodable row DROPS
    val sine = got(1L)
    assert(sine.nSamples === n.toLong)
    assert(math.abs(sine.rms - amp / math.sqrt(2.0)) < 0.01, sine.rms)
    assert(math.abs(sine.peak - amp) < 0.01, sine.peak)
    assert(math.abs(sine.zcr - 2 * f / sr) < 0.01, sine.zcr)
    val quiet = got(2L)
    assert(quiet.rms === 0.0 && quiet.peak === 0.0 && quiet.zcr === 0.0)
  }

  test("24-bit PCM (studio standard) yields the same features as 16-bit") {
    val sr = 8000f
    val f = 1000.0
    val amp = 0.5
    val n = 4000
    val fmt = new javax.sound.sampled.AudioFormat(sr, 24, 1, true, false)
    val pcm = new Array[Byte](n * 3)
    (0 until n).foreach { i =>
      val s = (amp * 8388607.0 *
        math.sin(2 * math.Pi * f * i / sr)).round.toInt
      pcm(3 * i) = (s & 0xff).toByte
      pcm(3 * i + 1) = ((s >> 8) & 0xff).toByte
      pcm(3 * i + 2) = ((s >> 16) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val got = Multimodal.audioFeatures(
        Seq((1L, out.toByteArray)).toDF("doc_id", "content"))
      .collect()
    assert(got.length === 1, "24-bit PCM row must not silently drop")
    val a = got(0)
    assert(a.nSamples === n.toLong)
    assert(math.abs(a.rms - amp / math.sqrt(2.0)) < 0.01, a.rms)
    assert(math.abs(a.peak - amp) < 0.01, a.peak)
    assert(math.abs(a.zcr - 2 * f / sr) < 0.01, a.zcr)
  }

  test("a BMP header declaring insane dims goes to the stub, never to ImageIO") {
    // 'BM' is a 2-byte magic; the reader allocates by the header's
    // unvalidated dims — a 2^30 × 2^30 claim must not reach it
    val bomb = new Array[Byte](64)
    bomb(0) = 'B'; bomb(1) = 'M'
    bomb(18 + 3) = 0x40 // width  = 2^30 little-endian
    bomb(22 + 3) = 0x40 // height = 2^30
    val got = Multimodal.Decoder.decode(9L, bomb)
    assert(got === Multimodal.DecodeStub.decode(9L, bomb))
  }

  test("animated GIF reports its real frame count") {
    def frame(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        3, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(1, 1, rgb)
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    Seq(0xff0000, 0x00ff00, 0x0000ff).foreach { c =>
      w.writeToSequence(new javax.imageio.IIOImage(frame(c), null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val meta = Multimodal.decodeMeta(
        Seq((1L, out.toByteArray)).toDF("doc_id", "content"))
      .collect()(0)
    assert(meta.kind === "image")
    assert((meta.width, meta.height) === (3, 3))
    assert(meta.nFrames === 3)
  }

  test("TIFF payloads decode for real; multi-page TIFFs report their page count") {
    def frame(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x00ff00)
      img
    }
    // single-page, both byte orders are the same writer's output
    val single = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frame(6, 4), "tiff", single)
    // multi-page via writeToSequence (the GIF animation treatment)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    (1 to 3).foreach { _ =>
      w.writeToSequence(new javax.imageio.IIOImage(frame(3, 3), null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val meta = Multimodal.decodeMeta(
        Seq((1L, single.toByteArray), (2L, out.toByteArray))
          .toDF("doc_id", "content"))
      .collect().sortBy(_.docId)
    assert(meta(0).kind === "image")
    assert((meta(0).width, meta(0).height, meta(0).nFrames) === (6, 4, 1))
    assert(meta(1).kind === "image")
    assert((meta(1).width, meta(1).height, meta(1).nFrames) === (3, 3, 3))
  }

  test("mp3 sync-frame headers decode to real rate/channels/duration") {
    // build a minimal MPEG1 Layer III stream: 128 kbps @ 44100 Hz,
    // joint stereo, no padding → frame length = 144*128000/44100 = 417
    def frame(): Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      f(2) = 0x90.toByte // bitrate idx 9 (128k), sr idx 0 (44100), no pad
      f(3) = 0x44.toByte // joint stereo
      f
    }
    val bare = Array.concat(frame(), frame(), frame())
    val m1 = Multimodal.Decoder.decode(1L, bare)
    // audio mapping: width = sample rate, height = channels,
    // nFrames = PCM sample frames (3 mp3 frames × 1152)
    assert(m1.kind === "audio")
    assert((m1.width, m1.height, m1.nFrames) === (44100, 2, 3 * 1152))
    assert(m1.nBytes === bare.length.toLong)

    // same stream behind an ID3v2 tag (10-byte header, 20-byte body)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20) ++ bare
    val m2 = Multimodal.Decoder.decode(2L, id3)
    assert((m2.kind, m2.width, m2.nFrames) === ("audio", 44100, 3 * 1152))

    // a MONO MPEG2 stream: 64 kbps @ 22050 Hz → 72*64000/22050 = 208
    def frame2(): Array[Byte] = {
      val f = new Array[Byte](208)
      f(0) = 0xff.toByte
      f(1) = 0xf3.toByte // MPEG2, Layer III
      f(2) = 0x80.toByte // bitrate idx 8 (64k), sr idx 0 (22050)
      f(3) = 0xc4.toByte // mono
      f
    }
    val v2 = Array.concat(frame2(), frame2())
    val m3 = Multimodal.Decoder.decode(3L, v2)
    assert((m3.width, m3.height, m3.nFrames) === (22050, 1, 2 * 576))

    // a text payload starting with "ID3" is NOT audio — no chained
    // sync frames, so it must fall to the stub, and the oracle's
    // code-point parity must keep agreeing
    val impostor = "ID3 is a tag format".getBytes("UTF-8")
    val m4 = Multimodal.Decoder.decode(4L, impostor)
    assert(m4.kind === ('I'.toInt % 3 match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }))
    assert(m4.width === 16 + 'D'.toInt) // stub dims
  }

  test("Xing/Info VBR header yields the exact frame count — metadata frame excluded") {
    // MPEG1 L3 128k @ 44100, joint stereo → 417-byte frames; the tag
    // sits after the 4-byte header + 32-byte side info (offset 36)
    def frame(): Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte
      f(2) = 0x90.toByte; f(3) = 0x44.toByte
      f
    }
    def tagged(tag: String, flags: Int, nFrames: Int): Array[Byte] = {
      val f = frame()
      tag.getBytes("US-ASCII").copyToArray(f, 36)
      f(40) = (flags >> 24).toByte; f(41) = (flags >> 16).toByte
      f(42) = (flags >> 8).toByte; f(43) = flags.toByte
      f(44) = (nFrames >> 24).toByte; f(45) = (nFrames >> 16).toByte
      f(46) = (nFrames >> 8).toByte; f(47) = nFrames.toByte
      f
    }
    // Xing frame + 2 audio frames: the raw walk counts 3 frames
    // (3456 sample frames); the Xing count (2) is authoritative and
    // excludes the metadata frame itself
    val vbr = Array.concat(tagged("Xing", 1, 2), frame(), frame())
    val m = Multimodal.Decoder.decode(1L, vbr)
    assert((m.kind, m.width, m.height) === ("audio", 44100, 2))
    assert(m.nFrames === 2 * 1152, s"got ${m.nFrames}, want Xing-exact 2304")

    // 'Info' (CBR-marked) tag: same layout, same handling
    val cbr = Array.concat(tagged("Info", 1, 2), frame(), frame())
    assert(Multimodal.Decoder.decode(2L, cbr).nFrames === 2 * 1152)

    // flags bit 0 unset → no frame-count field → fall back to the walk
    val noCount = Array.concat(tagged("Xing", 0, 999), frame(), frame())
    assert(Multimodal.Decoder.decode(3L, noCount).nFrames === 3 * 1152)
  }

  test("mp4 ftyp/mvhd/tkhd boxes decode to real duration and pixel dims") {
    def u32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      u32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    // mvhd v0: flags, ctime, mtime, timescale=600, duration=9000 (15 s)
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(9000))
    // tkhd v0: dims 640×360 in 16.16 fixed point at the matrix tail
    val tkhdBody =
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(0) ++   // hdr
        new Array[Byte](8) ++ new Array[Byte](2 + 2 + 2 + 2) ++      // resv…
        new Array[Byte](36) ++                                       // matrix
        u32(640L << 16) ++ u32(360L << 16)
    val moov = box("moov", mvhd ++ box("trak", box("tkhd", tkhdBody)))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512))
    val mp4 = ftyp ++ moov

    val m = Multimodal.Decoder.decode(1L, mp4)
    // video mapping: width/height = tkhd pixel dims, nFrames = mvhd
    // duration in milliseconds
    assert(m.kind === "video")
    assert((m.width, m.height, m.nFrames) === (640, 360, 15000))
    assert(m.nBytes === mp4.length.toLong)

    // no trak: duration still real, dims 0
    val noTrak = ftyp ++ box("moov", mvhd)
    val m2 = Multimodal.Decoder.decode(2L, noTrak)
    assert((m2.kind, m2.width, m2.height, m2.nFrames) === ("video", 0, 0, 15000))

    // ftyp magic but garbage boxes → stub, not a throw
    val corrupt = "xxxxftypgarbage-not-boxes".getBytes("US-ASCII")
    val m3 = Multimodal.Decoder.decode(3L, corrupt)
    assert(m3.width === 16 + 'x'.toInt) // stub dims
  }

  test("decode never throws on arbitrary bytes (one bad doc must not fail the job)") {
    // seeded fuzz across the dispatch surface: random payloads, random
    // payloads wearing each magic prefix, and truncations thereof —
    // every one must produce a MediaMeta, never an exception
    val rnd = new scala.util.Random(20260813L)
    val magics = Seq(
      Array[Byte](),                                         // plain noise
      Array[Byte]('I', 'D', '3'),                            // mp3 tag
      Array[Byte](0xff.toByte, 0xfb.toByte),                 // mp3 sync
      Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p'),          // mp4
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),    // jpeg
      "RIFFxxxxWAVE".getBytes("US-ASCII"),
      "FORMxxxxAIFF".getBytes("US-ASCII"))
    var n = 0
    for (magic <- magics; len <- Seq(0, 1, 3, 9, 64, 1024); _ <- 0 until 4) {
      val noise = new Array[Byte](len)
      rnd.nextBytes(noise)
      val payload = magic ++ noise
      val m = Multimodal.Decoder.decode(n.toLong, payload)
      assert(m.nBytes === payload.length.toLong)
      assert(Set("image", "audio", "video").contains(m.kind))
      n += 1
    }
    assert(n === magics.size * 6 * 4)
  }

  test("kind parity uses the first code point, not the first byte") {
    // 'é' = U+00E9 (233): 233 % 3 = 2 → video. Its UTF-8 lead byte is
    // 0xC3 (195): 195 % 3 = 0 would have said image — the SQL oracle
    // (ascii of the first CHARACTER) must agree with the stub.
    val meta = Multimodal.DecodeStub.decode(1L, "été".getBytes("UTF-8"))
    assert(meta.kind === "video")
    // malformed UTF-8 → replacement char, still deterministic
    val bad = Multimodal.DecodeStub.decode(2L, Array[Byte](0xc3.toByte))
    assert(bad.kind === (0xfffd % 3 match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }))
  }

  test("null and empty payloads are safe") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.binariesFromDocuments(df))
      .collect().sortBy(_.docId)
    assert(meta.length === 2)
    assert(meta.forall(_.nBytes === 0L))
    assert(meta.forall(_.kind === "image"))
    assert(meta.forall(_.meanByte === 0.0))
  }

  test("frame sampling explodes stride indices for videos only") {
    val df = Seq((3L, "ha")).toDF("doc_id", "text") // video, nFrames = 1 + 104%8 = 1
    val meta = Multimodal.decodeMeta(Multimodal.binariesFromDocuments(df))
    val frames = Multimodal.sampleFrames(meta, everyN = 2).collect()
    assert(frames.map(_.getAs[Int]("frameIdx")).toSeq === Seq(0))

    // a longer video: craft first byte 'h' (video) with nFrames = 1+104%8 = 1;
    // use byte 26 → '2'? simpler: verify images produce no frames
    val img = Seq((1L, "HELLO")).toDF("doc_id", "text")
    val imgFrames = Multimodal.sampleFrames(
      Multimodal.decodeMeta(Multimodal.binariesFromDocuments(img)), 1)
    assert(imgFrames.isEmpty)
  }

  test("binary columns survive a parquet round-trip (lake storage shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    val df = Seq((1L, "payload bytes")).toDF("doc_id", "text")
    Multimodal.binariesFromDocuments(df).write.parquet(s"$dir/bin")
    val back = spark.read.parquet(s"$dir/bin")
    assert(back.schema("content").dataType.typeName === "binary")
    val meta = Multimodal.decodeMeta(back).collect()
    assert(meta(0).nBytes === 13L)
  }
}
