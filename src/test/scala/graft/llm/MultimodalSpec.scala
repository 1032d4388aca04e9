package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode path with real media headers: MediaCodec parses
  * format + dimensions straight from bytes, and decodeMeta carries them
  * through the typed-batch plumbing. The declared q41 covers the opaque
  * (`bin`) path over the fixture corpus; these bytes cover the image paths.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0, 0, 0, 13, 'I', 'H', 'D', 'R',
      w >> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
      h >> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff,
      8, 2, 0, 0, 0)
    (sig ++ ihdr).map(_.toByte)
  }

  // SOI, APP0 segment (length 4, payload skipped), SOF0 with h/w big-endian
  private def jpeg(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46,
      0xff, 0xc0, 0x00, 0x0b, 8,
      h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)
      .map(_.toByte)

  private def gif(w: Int, h: Int): Array[Byte] =
    (Array[Int]('G', 'I', 'F', '8', '9', 'a',
      w & 0xff, w >> 8, h & 0xff, h >> 8, 0, 0, 0)).map(_.toByte)

  test("MediaCodec handles JPEG fill bytes and stops at SOS") {
    // spec-legal fill: extra 0xFF run before the SOF marker
    val padded = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x0b, 8,
      0x01, 0x00, 0x02, 0x00, 1, 1, 0x11, 0).map(_.toByte)
    assert(MediaCodec.sniff(padded) == MediaCodec.Sniffed("jpeg", 512, 256))
    // SOS before any SOF: stop with unknown dims, never parse scan bytes
    val scanFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x01, 0x02,
      0xff, 0xc0, 0x99, 0x99, 0x99, 0x99, 0x99, 0x99, 0x99).map(_.toByte)
    assert(MediaCodec.sniff(scanFirst) == MediaCodec.Sniffed("jpeg", 0, 0))
  }

  test("MediaCodec parses PNG / JPEG / GIF headers and rejects junk") {
    assert(MediaCodec.sniff(png(640, 480)) == MediaCodec.Sniffed("png", 640, 480))
    assert(MediaCodec.sniff(jpeg(1920, 1080)) == MediaCodec.Sniffed("jpeg", 1920, 1080))
    assert(MediaCodec.sniff(gif(320, 200)) == MediaCodec.Sniffed("gif", 320, 200))
    assert(MediaCodec.sniff("not an image".getBytes) == MediaCodec.Sniffed("bin", 0, 0))
    assert(MediaCodec.sniff(Array[Byte]()) == MediaCodec.Sniffed("bin", 0, 0))
    // truncated PNG signature must not throw
    assert(MediaCodec.sniff(png(9, 9).take(10)) == MediaCodec.Sniffed("bin", 0, 0))
  }

  test("extractFeatures computes byte-histogram signals") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaIn(1L, Array.fill[Byte](64)(65)),        // all 'A'
      Multimodal.MediaIn(2L, Array[Byte](0, 1, 2, 3)))
      .toDS().toDF()
    val out = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    // uniform payload: zero entropy, mean = 65, fully printable
    assert(out(0).getDouble(2) == 65.0)
    assert(out(0).getDouble(3) == 0.0)
    assert(out(0).getDouble(4) == 1.0)
    // four distinct bytes: exactly 2 bits of entropy, none printable
    assert(out(1).getDouble(3) == 2.0)
    assert(out(1).getDouble(4) == 0.0)
  }

  /** A real, fully decodable image produced by the JDK encoder itself:
    * a w×h gradient so resampling has non-trivial pixels to interpolate. */
  private def realImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("resize decodes real images and resamples to the target dims") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaIn(1L, realImage(64, 48, "png")),
      Multimodal.MediaIn(2L, realImage(100, 40, "jpg")),
      Multimodal.MediaIn(3L, realImage(16, 16, "gif"))).toDS().toDF()
    val out = Multimodal.resize(media, 32, 24).orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("png", "jpeg", "gif"))
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((64L, 48L), (100L, 40L), (16L, 16L)))
    out.foreach { r =>
      // output payload is a real PNG whose header carries the target dims...
      val resized = r.getAs[Array[Byte]](6)
      assert(MediaCodec.sniff(resized) == MediaCodec.Sniffed("png", 32, 24))
      // ...and fully decodes back to a 32x24 pixel raster
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resized))
      assert(back.getWidth == 32 && back.getHeight == 24)
    }
  }

  test("resize interpolates pixels (gradient survives downsampling)") {
    val src = realImage(64, 64, "png")
    val resized = Multimodal.imageResizePixels(src, 8, 8)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    // red channel still increases left-to-right after bilinear downsample
    val leftRed  = (img.getRGB(0, 4) >> 16) & 0xff
    val rightRed = (img.getRGB(7, 4) >> 16) & 0xff
    assert(rightRed > leftRed + 64)
  }

  test("resize yields empty payload (not an exception) on non-decodable bytes") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaIn(1L, png(640, 480)),              // header only, no IDAT
      Multimodal.MediaIn(2L, "plain text".getBytes),
      Multimodal.MediaIn(3L, Array.emptyByteArray)).toDS().toDF()
    val out = Multimodal.resize(media, 32, 32).orderBy("doc_id").collect()
    // header metadata still flows through even when pixels can't decode
    assert(out(0).getString(1) == "png")
    assert((out(0).getLong(2), out(0).getLong(3)) == (640L, 480L))
    assert(out.forall(_.getAs[Array[Byte]](6).isEmpty))
  }

  test("sampleFrames fans one payload out to n deterministic frames") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq(Multimodal.MediaIn(7L, payload)).toDS().toDF()
    val frames = Multimodal.sampleFrames(media, 4).orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(frames.length == 4)
    assert(frames.map(_._2.length).sum == 100)
    assert(frames(0)._2.head == 0.toByte && frames(3)._2.last == 99.toByte)
  }

  test("sampleFrames demuxes real Y4M frames with true frame numbers") {
    import spark.implicits._
    // 4x2 C420 -> 12 bytes per frame; 5 frames, each filled with its index
    val out = new java.io.ByteArrayOutputStream()
    out.write("YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    for (f <- 0 until 5) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(Array.fill[Byte](12)(f.toByte))
    }
    val media = Seq(Multimodal.MediaIn(9L, out.toByteArray)).toDS().toDF()
    val frames = Multimodal.sampleFrames(media, 2).orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(frames.map(_._1).toSeq == Seq(0, 2)) // evenly spaced REAL indices
    assert(frames.forall(_._2.length == 12))
    assert(frames(0)._2.forall(_ == 0.toByte))
    assert(frames(1)._2.forall(_ == 2.toByte))
    // asking for more frames than exist returns them all, once each
    val all = Multimodal.sampleFrames(media, 99).collect()
    assert(all.map(_.getInt(1)).sorted.toSeq == (0 until 5).toSeq)
  }

  test("Y4M demux keeps whole frames from a truncated stream") {
    val out = new java.io.ByteArrayOutputStream()
    out.write("YUV4MPEG2 W4 H2 C420\n".getBytes("US-ASCII"))
    out.write("FRAME\n".getBytes("US-ASCII"))
    out.write(Array.fill[Byte](12)(1.toByte))
    out.write("FRAME\n".getBytes("US-ASCII"))
    out.write(Array.fill[Byte](5)(2.toByte)) // second frame cut short
    val v = MediaCodec.demuxY4m(out.toByteArray)
    assert(v.exists(_.frameOffsets.length == 1))
    // header variants: mono/422/444 frame sizes, missing dims rejected
    assert(MediaCodec.demuxY4m(
      "YUV4MPEG2 W4 H2 Cmono\nFRAME\n12345678".getBytes("US-ASCII"))
      .exists(_.frameSize == 8))
    assert(MediaCodec.demuxY4m(
      "YUV4MPEG2 H2 C420\nFRAME\n".getBytes("US-ASCII")).isEmpty)
  }

  /** A real MJPEG AVI assembled the way the RIFF spec lays it out: hdrl
    * list with an avih main header, movi list with one `00dc` chunk per
    * JDK-encoded JPEG frame (word-aligned). */
  private def mjpegAvi(w: Int, h: Int, frames: Seq[Array[Byte]])
      : Array[Byte] = {
    def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array[Byte]()
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ children)
    val avih = new Array[Byte](56) // dwWidth/dwHeight at 32/36
    le32(w).copyToArray(avih, 32); le32(h).copyToArray(avih, 36)
    le32(frames.length).copyToArray(avih, 16) // dwTotalFrames
    val strf = new Array[Byte](40) // BITMAPINFOHEADER: biCompression at 16
    "MJPG".getBytes("US-ASCII").copyToArray(strf, 16)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).foldLeft(Array[Byte]())(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("AVI demux walks the RIFF tree: dims, codec, per-frame payloads") {
    val f = Seq(realImage(32, 24, "jpg"), realImage(32, 24, "jpg"),
      realImage(32, 24, "jpg"))
    val avi = mjpegAvi(32, 24, f)
    assert(MediaCodec.sniff(avi) == MediaCodec.Sniffed("avi", 32, 24))
    val v = MediaCodec.demuxAvi(avi).get
    assert(v.codec == "MJPG")
    assert(v.frameOffsets.length == 3)
    // each demuxed frame is byte-for-byte the original JPEG
    v.frameOffsets.zip(v.frameSizes).zip(f).foreach { case ((off, sz), orig) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + sz), orig))
    }
    // truncated mid-frame: the whole frames survive, no exception
    val torn = java.util.Arrays.copyOf(avi, avi.length - f.last.length / 2)
    assert(MediaCodec.demuxAvi(torn).get.frameOffsets.length <= 2)
  }

  test("sampleFrames demuxes MJPEG AVI frames that decode as JPEGs") {
    import spark.implicits._
    val frames = (0 until 5).map(_ => realImage(48, 32, "jpg"))
    val media = Seq(Multimodal.MediaIn(11L, mjpegAvi(48, 32, frames)))
      .toDS().toDF()
    val out = Multimodal.sampleFrames(media, 2).orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(out.map(_._1).toSeq == Seq(0, 2)) // evenly spaced REAL indices
    // the sampled frame payloads decode with the JDK codec already in the
    // pixel path — compressed-container frame sampling, end to end
    out.foreach { case (_, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 48 && img.getHeight == 32)
    }
  }

  /** Minimal-but-valid ISO BMFF fixture in faststart layout (moov before
    * mdat, the streaming-friendly order real muxers emit): ftyp + moov
    * whose trak/mdia carry hdlr 'vide' and an stbl (stsd/stsz/stsc/stco)
    * describing the frame payloads, + mdat holding them in two chunks
    * (2 samples then the rest). Built by hand so the test owns every
    * offset; stco values are resolved by a two-pass build (moov's LENGTH
    * doesn't depend on them).
    */
  private def mp4(w: Int, h: Int, frames: Seq[Array[Byte]],
                  codec: String = "avc1"): Array[Byte] = {
    def be16(v: Int) = Array((v >> 8) & 0xff, v & 0xff).map(_.toByte)
    def be32(v: Int) = Array((v >> 24) & 0xff, (v >> 16) & 0xff,
      (v >> 8) & 0xff, v & 0xff).map(_.toByte)
    def box(tp: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.foldLeft(Array[Byte]())(_ ++ _)
      be32(8 + body.length) ++ tp.getBytes("US-ASCII") ++ body
    }
    // VisualSampleEntry: 8 hdr + 6 reserved + 2 dri + 16 predefined +
    // w + h + 46 trailing (resolution, frame_count, compressorname, depth)
    val entry = be32(86) ++ codec.getBytes("US-ASCII") ++
      new Array[Byte](8) ++ new Array[Byte](16) ++
      be16(w) ++ be16(h) ++ new Array[Byte](46)
    val hdlr = box("hdlr", be32(0), be32(0),
      "vide".getBytes("US-ASCII"), new Array[Byte](12))
    val nChunks = (frames.length + 1) / 2 // 2 samples per chunk
    def moovAt(chunk1: Int): Array[Byte] = {
      val chunkOffs = (0 until nChunks).map(c => chunk1 +
        frames.take(2 * c).map(_.length).sum)
      val stsd = box("stsd", be32(0), be32(1), entry)
      val stsz = box("stsz", be32(0), be32(0), be32(frames.length),
        frames.map(f => be32(f.length)).foldLeft(Array[Byte]())(_ ++ _))
      val stsc = box("stsc", be32(0), be32(1), be32(1), be32(2), be32(1))
      val stco = box("stco", be32(0), be32(nChunks),
        chunkOffs.map(be32).foldLeft(Array[Byte]())(_ ++ _))
      box("moov", box("trak", box("mdia", hdlr,
        box("minf", box("stbl", stsd, stsz, stsc, stco)))))
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0))
    val moovLen = moovAt(0).length
    val chunk1 = ftyp.length + moovLen + 8 // right after the mdat header
    val mdat = box("mdat", frames.foldLeft(Array[Byte]())(_ ++ _))
    ftyp ++ moovAt(chunk1) ++ mdat
  }

  test("MP4 demux walks the box tree: dims, codec, per-frame payloads") {
    val f = Seq.tabulate(3)(i => Array.tabulate[Byte](10 + 2 * i)(k =>
      (i * 31 + k).toByte))
    val m = mp4(320, 240, f)
    assert(MediaCodec.sniff(m) == MediaCodec.Sniffed("mp4", 320, 240))
    val v = MediaCodec.demuxMp4(m).get
    assert(v.codec == "avc1" && v.width == 320 && v.height == 240)
    assert(v.frameOffsets.length == 3)
    // each demuxed sample is byte-for-byte the original payload, across
    // the 2-samples-then-1 chunk split the stsc run describes
    v.frameOffsets.zip(v.frameSizes).zip(f).foreach { case ((off, sz), orig) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(m, off, off + sz), orig))
    }
  }

  test("MP4 demux keeps whole frames when mdat is truncated") {
    val f = Seq.tabulate(3)(i => Array.fill[Byte](20)(i.toByte))
    val m = mp4(64, 48, f)
    assert(MediaCodec.demuxMp4(m).get.frameOffsets.length == 3)
    // faststart layout: cutting mid-frame-3 leaves the tables intact but
    // the last sample half-contained — the bounds guard must drop exactly
    // it, no exception
    val cutLen = MediaCodec.demuxMp4(m).get.frameOffsets(2) + 10
    val torn = MediaCodec.demuxMp4(
      java.util.Arrays.copyOf(m, cutLen)).get
    assert(torn.frameOffsets.length == 2)
    assert(torn.width == 64 && torn.codec == "avc1")
  }

  test("sampleFrames emits true MP4 sample payloads with real indices") {
    import spark.implicits._
    val frames = (0 until 6).map(i => Array.fill[Byte](16)(i.toByte))
    val media = Seq(Multimodal.MediaIn(13L, mp4(128, 96, frames)))
      .toDS().toDF()
    val out = Multimodal.sampleFrames(media, 3).orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(out.map(_._1).toSeq == Seq(0, 2, 4)) // evenly spaced REAL indices
    out.foreach { case (fi, bytes) =>
      assert(java.util.Arrays.equals(bytes, frames(fi)))
    }
  }

  test("sniffer and resize never throw on fuzzed bytes") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 500) {
      val b = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      // seed with real magic numbers sometimes so parsing goes deeper
      if (b.length >= 2 && rnd.nextBoolean()) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte }
      MediaCodec.sniff(b)
      Multimodal.imageResizePixels(b, 8, 8)
    }
    // and the Y4M demuxer on fuzzed header tails after the real magic
    for (_ <- 1 to 500) {
      val tail = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      val b = "YUV4MPEG2 ".getBytes("US-ASCII") ++ tail
      MediaCodec.demuxY4m(b) // must never throw
    }
    // and the AVI walker on fuzzed RIFF bodies
    for (_ <- 1 to 500) {
      val tail = Array.fill[Byte](rnd.nextInt(128))(rnd.nextInt().toByte)
      val b = "RIFF".getBytes("US-ASCII") ++ tail
      if (b.length >= 12) "AVI ".getBytes("US-ASCII").copyToArray(b, 8)
      MediaCodec.demuxAvi(b) // must never throw
    }
  }

  test("decodeMeta carries real headers through the typed batch path") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaIn(1L, png(640, 480)),
      Multimodal.MediaIn(2L, jpeg(1920, 1080)),
      Multimodal.MediaIn(3L, "plain text".getBytes))
      .toDS().toDF()
    val out = Multimodal.decodeMeta(media).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, "png", 640L, 480L),
      (2L, "jpeg", 1920L, 1080L),
      (3L, "bin", 0L, 0L)))
  }

  /** [[realImage]] with a per-pixel perturbation — visually the same
    * gradient, byte-wise a different file (different SHA, near-equal
    * perceptual hash). */
  private def noisyImage(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val n = ((x * 31 + y * 17 + seed) % 7) - 3 // +-3 luma jitter
      val r = (x * 255 / w + n).max(0).min(255)
      val g = (y * 255 / h + n).max(0).min(255)
      img.setRGB(x, y, (r << 16) | (g << 8) | 0x40)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: jittered re-renders are near, inverses far") {
    import spark.implicits._
    val base = realImage(64, 48, "png")
    val noisy = noisyImage(64, 48, 1)
    // the visual opposite: the same gradient mirrored AND inverted
    val inv = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      for (y <- 0 until 48; x <- 0 until 64 / 2) {
        val a = img.getRGB(x, y); val b = img.getRGB(63 - x, y)
        img.setRGB(x, y, ~b & 0xffffff); img.setRGB(63 - x, y, ~a & 0xffffff)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(!java.util.Arrays.equals(base, noisy),
      "fixture must differ byte-wise")
    val media = Seq(
      Multimodal.MediaIn(1L, base), Multimodal.MediaIn(2L, noisy),
      Multimodal.MediaIn(3L, inv),
      Multimodal.MediaIn(4L, "not an image".getBytes)).toDS().toDF()
    val hashes = Multimodal.perceptualHash(media)
    val rows = hashes.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._3).toSeq == Seq(true, true, true, false),
      "only the real images decode")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(rows(0)._2, rows(1)._2) <= 3,
      "jittered copy within hamming 3 of the original")
    assert(ham(rows(0)._2, rows(2)._2) > 10,
      "mirrored+inverted image is perceptually far")
    // the banded join finds exactly the near pair, exact distances attached
    val pairs = Multimodal.nearDupByHamming(hashes, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == ham(rows(0)._2, rows(1)._2))
  }

  test("q245 recovers exactly the planted synthetic near-dup groups") {
    // the declared query's ground truth: syntheticPngCorpus plants
    // groups of 8 consecutive doc_ids at pairwise Hamming distance 2
    // (one flipped block each); the banded join must recover EVERY
    // within-group pair (pigeonhole guarantees recall at distance <= 3)
    // and, on this fixture, nothing across groups.
    val out = graft.SparkEntry.queries("q245_phash_dedup")(
      spark, graft.TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = graft.Tables.t(spark, graft.TestSpark.Sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val expected = ids.groupBy(_ / 8).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.toSet
    assert(out.map(p => (p._1, p._2)).toSet == expected,
      "pair set must equal the planted same-group pairs")
    assert(out.forall(_._3 == 2), "planted pairs sit at Hamming exactly 2")
  }

  test("MP4 with motion-JPEG samples decodes to pixels end to end") {
    import spark.implicits._
    // 'jpeg' is the BMFF/QuickTime sample entry for motion JPEG: each
    // sample is a complete JPEG, so the MP4 path covers a compressed
    // container to PIXELS with the JDK codec — the remaining seam is
    // inter-coded codecs (avc1 etc.), not the container
    val frames = (0 until 4).map(_ => realImage(40, 24, "jpg"))
    val media = Seq(Multimodal.MediaIn(17L, mp4(40, 24, frames, "jpeg")))
      .toDS().toDF()
    assert(MediaCodec.demuxMp4(mp4(40, 24, frames, "jpeg")).get
      .codec == "jpeg")
    val out = Multimodal.sampleFrames(media, 2).orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(out.map(_._1).toSeq == Seq(0, 2))
    out.foreach { case (_, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 40 && img.getHeight == 24)
    }
  }

  // hand-built WAV: canonical header, optional extra chunks before data
  private def wav(samples: Array[Short], rate: Int = 8000,
                  channels: Short = 1,
                  extraChunks: Array[Byte] = Array.emptyByteArray)
      : Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer
      .allocate(44 + extraChunks.length + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + extraChunks.length + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels)
      .putInt(rate).putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put(extraChunks)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("WAV demux: fmt parse, chunk skip, sample round-trip, sniff") {
    val xs = Array[Short](0, 100, -100, 32767, -32768, 7)
    // a LIST metadata chunk between fmt and data must be skipped
    val list = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("INFOxy".getBytes("US-ASCII")).array()
    val b = wav(xs, rate = 44100, extraChunks = list)
    val w = MediaCodec.demuxWav(b).get
    assert(w.sampleRate == 44100 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.nSamples == xs.length)
    assert(MediaCodec.pcm16Samples(b, w).toSeq == xs.map(_.toInt).toSeq)
    assert(MediaCodec.sniff(b) == MediaCodec.Sniffed("wav", 44100L, 1L))
  }

  test("WAV demux: stereo stride, torn data clamped to whole frames") {
    // stereo: channel 0 is every other sample
    val inter = Array[Short](10, -10, 20, -20, 30, -30) // 3 frames, 2 ch
    val b = wav(inter, channels = 2)
    val w = MediaCodec.demuxWav(b).get
    assert(w.channels == 2 && w.nSamples == 3)
    assert(MediaCodec.pcm16Samples(b, w).toSeq == Seq(10, 20, 30))
    // tearing mid-frame keeps only the fully-present frames — no throw
    val torn = java.util.Arrays.copyOf(b, b.length - 3)
    val wt = MediaCodec.demuxWav(torn).get
    assert(wt.nSamples == 2)
    assert(MediaCodec.pcm16Samples(torn, wt).toSeq == Seq(10, 20))
    // non-PCM format tag (0x0003 = IEEE float) stays behind the seam
    val f32 = b.clone(); f32(20) = 3
    assert(MediaCodec.demuxWav(f32).isEmpty)
  }

  test("audio content hash ignores container wrapping (q259's key claim)") {
    import spark.implicits._
    val xs = Array.tabulate[Short](400)(i => ((i % 7) * 1000 - 3000).toShort)
    val list = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(8)
      .put("INFOmeta".getBytes("US-ASCII")).array()
    val plain   = wav(xs)
    val wrapped = wav(xs, extraChunks = list) // same PCM, different bytes
    assert(!java.util.Arrays.equals(plain, wrapped))
    val fps = Multimodal.audioContentHash(
        Seq(Multimodal.MediaIn(1L, plain), Multimodal.MediaIn(2L, wrapped))
          .toDS().toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a file-level hash would split these; the sample-grain hash must not
    assert(fps(1L) == fps(2L))
    // and different PCM must split
    val other = wav(xs.map(x => (x + 1).toShort))
    val fp3 = Multimodal.audioContentHash(
        Seq(Multimodal.MediaIn(3L, other)).toDS().toDF())
      .collect().head.getLong(1)
    assert(fp3 != fps(1L))
  }

  test("q273 recovers the planted audio near-dup groups; gain-invariant") {
    import spark.implicits._
    // the declared query's ground truth (the q245 assertion at audio
    // grain): syntheticWavFpCorpus plants groups of 8 consecutive
    // doc_ids at fingerprint Hamming exactly 2, across DIFFERENT
    // per-doc volume gains
    val out = graft.SparkEntry.queries("q273_audio_fp_neardup")(
      spark, graft.TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = graft.Tables.t(spark, graft.TestSpark.Sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val expected = ids.groupBy(_ / 8).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.toSet
    assert(out.map(p => (p._1, p._2)).toSet == expected,
      "pair set must equal the planted same-group pairs")
    assert(out.forall(_._3 == 2), "planted pairs sit at Hamming exactly 2")
    // gain invariance, directly: the same clip re-rendered at ×1.5
    // volume (exact on doc 0's multiple-of-4 amplitudes; walk max
    // 21480 × 3/2 = 32220 < 2¹⁵, so no clipping) must produce the
    // IDENTICAL fingerprint — where the exact sample-grain hash
    // (q259's kernel) must split the pair
    val corpus = Multimodal.syntheticWavFpCorpus(Seq(0L).toDF("doc_id"))
    val base = corpus.collect().head.getAs[Array[Byte]]("payload")
    val w = graft.llm.MediaCodec.demuxWav(base).get
    val louder = base.clone()
    var k = 0
    while (k < w.nSamples) {
      val off = w.dataOffset + k * 2
      val x0 = ((louder(off + 1).toInt << 8) |
        (louder(off) & 0xff)).toShort.toInt
      val x = (x0 * 3 / 2).toShort
      louder(off) = (x & 0xff).toByte
      louder(off + 1) = ((x >> 8) & 0xff).toByte
      k += 1
    }
    val fpRows = Multimodal.audioFingerprint(Seq(
        Multimodal.MediaIn(1L, base), Multimodal.MediaIn(2L, louder))
        .toDS().toDF())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // both renders must actually decode — otherwise both fingerprints
    // would be 0L and the invariance assertion below passes vacuously
    assert(fpRows(1L)._2 && fpRows(2L)._2, "both renders must decode")
    val fps = fpRows.map { case (k, (fp, _)) => k -> fp }
    assert(fps(1L) == fps(2L), "fingerprint is gain-invariant")
    val exact = Multimodal.audioContentHash(Seq(
        Multimodal.MediaIn(1L, base), Multimodal.MediaIn(2L, louder))
        .toDS().toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact(1L) != exact(2L), "the exact hash splits the gain pair")
  }

  test("q258 features match the planted waveform's closed form") {
    val out = graft.SparkEntry.queries("q258_audio_features")(
      spark, graft.TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val amp = 8000 + (id % 7) * 1000
      val hp = 10 + (id % 5) * 5
      val sil = (id % 4) * 100
      val act = 800 - sil
      assert(r.getAs[Long]("sample_rate") == 8000L)
      assert(r.getAs[Long]("n_channels") == 1L)
      assert(r.getAs[Long]("n_samples") == 800L)
      assert(r.getAs[Long]("peak_abs") == amp)
      assert(r.getAs[Long]("n_zero_cross") == (act - 1) / hp)
      assert(r.getAs[Long]("energy_sum") == act * amp * amp)
      assert(r.getAs[Long]("active_frames") == 4 - sil / 200)
    }
  }

  test("q299 scene cuts recover the planted shot boundaries exactly") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 5L, 7L, 11L)
    val media = Multimodal.syntheticY4mSceneCorpus(ids.toDF("doc_id"))
    val got = Multimodal.sceneCuts(media)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val want = ids.flatMap { id =>
      val l1 = 40 + (id % 3) * 10
      val l2 = 120 + (id % 5) * 8
      val l3 = 200 + (id % 4) * 5
      Seq((id, 3 + id % 3, (l2 - l1) * 256),
        (id, 8 + id % 2, (l3 - l2) * 256))
    }.sorted
    assert(got.toSeq == want)
    // both cut diffs clear the 30/pixel threshold and within-shot diffs
    // are exactly zero, so exactly two cuts per doc
    assert(got.length == ids.size * 2)
    // survival rule: corrupted/non-video payloads yield no rows
    val junk = Seq(
      Multimodal.MediaIn(99L, Array[Byte](1, 2, 3)),
      Multimodal.MediaIn(100L, "YUV4MPEG2 W0 H0\n".getBytes("US-ASCII")),
      Multimodal.MediaIn(101L, Array.empty[Byte]))
      .toDS().toDF()
    assert(Multimodal.sceneCuts(junk).count() == 0L)
  }
}
