package graft.llm

/** Pure-JVM media header sniffing: container format + pixel dimensions
  * parsed straight from the leading bytes of a payload. This is the real
  * decode step of the multimodal path (SURVEY.md §2.3) at header depth —
  * full pixel decode needs codec libraries and stays behind the same seam,
  * but format detection and dimensions are what a training-data pipeline
  * filters on (drop non-images, drop tiny images) and those are fully
  * derivable from the headers:
  *
  *  - PNG:  8-byte signature, then the IHDR chunk carries width/height as
  *          big-endian 32-bit ints at offsets 16/20.
  *  - JPEG: FF D8 SOI, then marker segments; the SOF0–SOF15 frame headers
  *          (minus DHT/DNL/DAC) carry height/width big-endian at +5/+7.
  *  - GIF:  "GIF87a"/"GIF89a", logical screen size little-endian at 6/8.
  *
  * Anything unrecognized (or truncated) is an opaque `bin` payload with
  * zero dimensions — never an exception: malformed media must not kill a
  * 100 TB scan.
  */
object MediaCodec {

  final case class Sniffed(format: String, width: Long, height: Long)

  private val Bin = Sniffed("bin", 0L, 0L)

  def sniff(b: Array[Byte]): Sniffed =
    if (isPng(b)) sniffPng(b)
    else if (isJpeg(b)) sniffJpeg(b)
    else if (isGif(b)) sniffGif(b)
    else if (isY4m(b)) demuxY4m(b)
      .map(v => Sniffed("y4m", v.width, v.height)).getOrElse(Bin)
    else if (isAvi(b)) demuxAvi(b)
      .map(v => Sniffed("avi", v.width, v.height)).getOrElse(Bin)
    else if (isMp4(b)) demuxMp4(b)
      .map(v => Sniffed("mp4", v.width, v.height)).getOrElse(Bin)
    // audio has no pixel dims; width/height carry rate/channels (the two
    // numbers an audio triage filter drops on), documented at [[Wav]]
    else if (isWav(b)) demuxWav(b)
      .map(v => Sniffed("wav", v.sampleRate.toLong, v.channels.toLong))
      .getOrElse(Bin)
    else Bin

  /** A demuxed uncompressed Y4M (YUV4MPEG2) video: raw planar frames at
    * `frameOffsets` (payload offsets of the first plane byte), each
    * `frameSize` bytes. */
  final case class Y4m(width: Int, height: Int, frameSize: Int,
                       frameOffsets: Array[Int])

  private def isY4m(b: Array[Byte]): Boolean = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    b.length > magic.length && magic.indices.forall(i => b(i) == magic(i))
  }

  /** Pure-JVM demux of the one video container that needs NO codec:
    * Y4M is an ASCII parameter line (`YUV4MPEG2 W.. H.. F.. C..`)
    * followed by raw planar frames, each introduced by an ASCII
    * `FRAME...` line — so real frame extraction is header parsing plus
    * offset arithmetic. Compressed containers (MP4/H.264 …) still need
    * external codecs and stay behind the documented seam; a pipeline
    * transcodes to Y4M upstream ONCE and every downstream frame-sample
    * pass is then pure byte slicing. Truncated or malformed payloads
    * yield the frames that fully fit, never an exception.
    */
  def demuxY4m(b: Array[Byte]): Option[Y4m] = {
    if (!isY4m(b)) return None
    val nl = b.indexOf('\n'.toByte)
    if (nl < 0 || nl > 512) return None
    val params = new String(b, 0, nl, "US-ASCII").split(" ").drop(1)
    def num(tag: Char): Option[Int] = params
      .collectFirst { case p if p.nonEmpty && p.head == tag &&
        p.tail.forall(_.isDigit) && p.tail.nonEmpty => p.tail.toInt }
    (num('W'), num('H')) match {
      case (Some(w), Some(h)) if w > 0 && h > 0 =>
        val chroma = params.collectFirst {
          case p if p.nonEmpty && p.head == 'C' => p.tail }.getOrElse("420")
        val frameSize: Long =
          if (chroma.startsWith("mono")) w.toLong * h
          else if (chroma.startsWith("444")) w.toLong * h * 3
          else if (chroma.startsWith("422")) w.toLong * h * 2
          else w.toLong * h * 3 / 2 // 420 family (jpeg/paldv/mpeg2)
        if (frameSize <= 0 || frameSize > Int.MaxValue) return None
        val marker = "FRAME".getBytes("US-ASCII")
        val offsets = Array.newBuilder[Int]
        var i = nl + 1
        var ok = true
        while (ok && i < b.length) {
          if (i + marker.length <= b.length &&
              marker.indices.forall(k => b(i + k) == marker(k))) {
            var j = i + marker.length // optional frame params up to '\n'
            while (j < b.length && b(j) != '\n'.toByte) j += 1
            val dataStart = j + 1
            if (j < b.length && dataStart + frameSize <= b.length) {
              offsets += dataStart
              i = dataStart + frameSize.toInt
            } else ok = false // truncated tail: keep the full frames
          } else ok = false // malformed stream: stop, never throw
        }
        Some(Y4m(w, h, frameSize.toInt, offsets.result()))
      case _ => None
    }
  }

  /** A demuxed AVI (RIFF) video: per-frame chunk payload offsets/sizes of
    * the first video stream. For an MJPEG AVI every frame payload is a
    * complete JPEG — decodable by the JDK codec already in the pixel path,
    * so frame sampling covers a COMPRESSED container with no external
    * dependency. `codec` is the stream's FourCC (e.g. "MJPG"). */
  final case class Avi(width: Long, height: Long, codec: String,
                       frameOffsets: Array[Int], frameSizes: Array[Int])

  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) ""
    else new String(b, i, 4, "US-ASCII")

  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)

  private def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  /** Pure-JVM RIFF walk: `LIST` nodes recurse, `avih` carries the frame
    * dimensions (dwWidth/dwHeight at data offsets 32/36), `strf`'s
    * BITMAPINFOHEADER carries the codec FourCC (biCompression at data
    * offset 16), and the `movi` payload chunks `##dc`/`##db` of stream 00
    * are the frames. Chunks are word-aligned (odd sizes pad one byte).
    * Truncated or malformed structure yields the frames that fully fit —
    * never an exception: malformed media must not kill a 100 TB scan.
    */
  def demuxAvi(b: Array[Byte]): Option[Avi] = {
    if (!isAvi(b)) return None
    var width = 0L; var height = 0L; var codec = ""
    val offs  = Array.newBuilder[Int]
    val sizes = Array.newBuilder[Int]
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return // malformed self-nesting guard
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val id = fourcc(b, i)
        val sz = le32(b, i + 4)
        if (sz < 0 || sz > Int.MaxValue - 16 || i + 8 + sz > end) ok = false
        else {
          val dataStart = i + 8
          id match {
            case "LIST" if sz >= 4 =>
              walk(dataStart + 4, dataStart + sz.toInt, depth + 1)
            case "avih" if sz >= 40 =>
              width = le32(b, dataStart + 32)
              height = le32(b, dataStart + 36)
            case "strf" if sz >= 20 && codec.isEmpty =>
              codec = fourcc(b, dataStart + 16).trim
            case "00dc" | "00db" =>
              offs += dataStart; sizes += sz.toInt
            case _ => () // other streams / index / junk: skip
          }
          i = dataStart + sz.toInt + (sz.toInt & 1)
        }
      }
    }
    walk(12, math.min(b.length, 8 + le32(b, 4)).toInt max 12, 0)
    Some(Avi(width, height, codec, offs.result(), sizes.result()))
  }

  /** A demuxed WAV (RIFF/WAVE) audio clip: PCM sample format plus the
    * `data` chunk's payload byte range. Like Y4M for video, linear-PCM WAV
    * is the one audio container that needs NO codec — sample extraction is
    * header parsing plus offset arithmetic, so a pipeline transcodes
    * compressed audio to PCM upstream once and every downstream feature
    * pass is pure byte reads. In [[Sniffed]] terms width carries
    * `sampleRate` and height `channels`. */
  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       dataOffset: Int, dataLen: Int) {
    /** Per-channel sample frames that FULLY fit in the payload. */
    def nSamples: Int = {
      val bytesPerFrame = channels * (bitsPerSample / 8)
      if (bytesPerFrame <= 0) 0 else dataLen / bytesPerFrame
    }
  }

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE"

  /** Pure-JVM RIFF/WAVE walk: `fmt ` carries the PCM format (audio format
    * tag at data offset 0 — only 1 = integer linear PCM is accepted;
    * compressed tags stay behind the codec seam), channels at 2, sample
    * rate at 4, bits-per-sample at 14; the first `data` chunk is the
    * sample payload. Chunks are word-aligned (odd sizes pad one byte). A
    * truncated `data` chunk is CLAMPED to the bytes actually present
    * (the fully-fitting sample frames survive, [[Wav.nSamples]]) — never
    * an exception: malformed media must not kill a 100 TB scan.
    */
  def demuxWav(b: Array[Byte]): Option[Wav] = {
    if (!isWav(b)) return None
    var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0
    var i = 12
    var ok = true
    while (ok && i + 8 <= b.length) {
      val id = fourcc(b, i)
      val sz = le32(b, i + 4)
      if (sz < 0 || sz > Int.MaxValue - 16) ok = false
      else {
        val dataStart = i + 8
        id match {
          case "fmt " if sz >= 16 && dataStart + 16 <= b.length =>
            val tag = le16(b, dataStart).toInt
            channels = le16(b, dataStart + 2).toInt
            rate = le32(b, dataStart + 4).toInt
            bits = le16(b, dataStart + 14).toInt
            fmtOk = tag == 1 && channels > 0 && rate > 0 &&
              (bits == 8 || bits == 16 || bits == 24 || bits == 32)
          case "data" if dataOff < 0 =>
            dataOff = dataStart
            dataLen = math.min(sz, (b.length - dataStart).toLong).toInt
          case _ => () // LIST/fact/cue/junk: skip
        }
        // next offset in Long — dataStart + sz can pass Int.MaxValue for
        // a corrupt near-2^31 declared size, and a negative Int here
        // would slip past the loop guard into fourcc/le32 (the demuxAvi
        // walker guards the same way); the data-chunk clamp above still
        // keeps the fully-fitting frames of a truncated final chunk
        val next = dataStart.toLong + sz + (sz & 1L)
        if (next > b.length) ok = false else i = next.toInt
      }
    }
    if (fmtOk && dataOff >= 0) Some(Wav(channels, rate, bits, dataOff, dataLen))
    else None
  }

  /** Channel-0 PCM samples as signed ints (16-bit little-endian path —
    * the transcode-target format). Offset arithmetic only; other depths
    * stay behind the seam ([[demuxWav]] validates they exist). */
  def pcm16Samples(b: Array[Byte], w: Wav): Array[Int] = {
    if (w.bitsPerSample != 16) return Array.emptyIntArray
    val stride = w.channels * 2
    val n = w.nSamples
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      val off = w.dataOffset + k * stride
      out(k) = ((b(off + 1).toInt << 8) | (b(off) & 0xff)).toShort.toInt
      k += 1
    }
    out
  }

  /** A demuxed MP4 (ISO BMFF) video: per-sample payload offsets/sizes of
    * the first video trak, plus the sample entry's codec FourCC (e.g.
    * "avc1") and visual dimensions. Sample payloads are codec bitstream
    * (H.264 access units, not JPEGs), so PIXEL decode stays behind the
    * external-codec seam — but the demux itself (which bytes are frame k,
    * what codec, what dims — everything a sampling/filtering pipeline
    * needs before decode) is now real, the same contract as [[demuxAvi]].
    */
  final case class Mp4(width: Long, height: Long, codec: String,
                       frameOffsets: Array[Int], frameSizes: Array[Int])

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 4) == "ftyp"

  /** Pure-JVM ISO BMFF box walk: containers (`moov`/`trak`/`mdia`/`minf`/
    * `stbl`) recurse; `hdlr` flags the video trak (`vide`); inside its
    * sample table, `stsd`'s first VisualSampleEntry carries codec FourCC
    * (+4) and width/height (+32/+34 from the entry start), `stsz` the
    * per-sample sizes, `stsc` the samples-per-chunk runs, and `stco`/
    * `co64` the chunk file offsets; a sample's offset is its chunk offset
    * plus the sizes of the samples before it in that chunk. 64-bit
    * largesize and size-0 (to-end) boxes are handled; truncated tables or
    * out-of-range samples yield the frames that fully fit — never an
    * exception: malformed media must not kill a 100 TB scan.
    */
  def demuxMp4(b: Array[Byte]): Option[Mp4] = {
    if (!isMp4(b)) return None
    var width = 0L; var height = 0L; var codec = ""
    var sizes: Array[Int] = Array.empty
    var chunkOffsets: Array[Long] = Array.empty
    var stsc: Array[(Long, Long)] = Array.empty
    var videoTrak = false
    var done = false // first video trak with sample tables wins

    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 10) return
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val sz32 = be32(b, i)
        val tp = fourcc(b, i + 4)
        var hdr = 8L
        val boxLen: Long =
          if (sz32 == 1L && i + 16 <= end) { hdr = 16L; be64(b, i + 8) }
          else if (sz32 == 0L) (end - i).toLong
          else sz32
        if (boxLen < hdr || i + boxLen > end) ok = false
        else {
          val ds = i + hdr.toInt
          val de = i + boxLen.toInt
          tp match {
            case "moov" | "mdia" | "minf" | "stbl" => walk(ds, de, depth + 1)
            case "trak" if !done =>
              videoTrak = false
              walk(ds, de, depth + 1)
              if (videoTrak && sizes.nonEmpty) done = true
            case "hdlr" if de - ds >= 12 =>
              videoTrak = fourcc(b, ds + 8) == "vide"
            case "stsd" if videoTrak && !done && de - ds >= 44 =>
              val es = ds + 8 // first sample entry
              codec = fourcc(b, es + 4).trim
              width = be16(b, es + 32)
              height = be16(b, es + 34)
            case "stsz" if videoTrak && !done && de - ds >= 12 =>
              val fixed = be32(b, ds + 4)
              // fixed-size mode carries no table to bound n — cap by the
              // payload's own capacity (can't hold more samples than
              // bytes), so a lying header can't force a huge allocation
              val n = (be32(b, ds + 8) min
                (if (fixed != 0) b.length.toLong / (fixed max 1L)
                 else (de - ds - 12).toLong / 4)).toInt max 0
              sizes =
                if (fixed != 0) Array.fill(n)(fixed.toInt)
                else Array.tabulate(n)(k => be32(b, ds + 12 + 4 * k).toInt)
            case "stsc" if videoTrak && !done && de - ds >= 8 =>
              val n = (be32(b, ds + 4) min
                (de - ds - 8).toLong / 12).toInt max 0
              stsc = Array.tabulate(n)(k =>
                (be32(b, ds + 8 + 12 * k), be32(b, ds + 12 + 12 * k)))
            case "stco" if videoTrak && !done && de - ds >= 8 =>
              val n = (be32(b, ds + 4) min
                (de - ds - 8).toLong / 4).toInt max 0
              chunkOffsets = Array.tabulate(n)(k => be32(b, ds + 8 + 4 * k))
            case "co64" if videoTrak && !done && de - ds >= 8 =>
              val n = (be32(b, ds + 4) min
                (de - ds - 8).toLong / 8).toInt max 0
              chunkOffsets = Array.tabulate(n)(k => be64(b, ds + 8 + 8 * k))
            case _ => () // other traks' tables, mdat, udta, free: skip
          }
          i = de
        }
      }
    }
    walk(0, b.length, 0)

    val offs = Array.newBuilder[Int]
    val szs = Array.newBuilder[Int]
    var sample = 0
    var c = 0
    while (c < chunkOffsets.length && sample < sizes.length) {
      val spc = stsc.takeWhile(_._1 <= c + 1)
        .lastOption.map(_._2.toInt).getOrElse(0)
      var off = chunkOffsets(c)
      var k = 0
      while (k < spc && sample < sizes.length) {
        val ssz = sizes(sample)
        if (off >= 0 && ssz > 0 && off + ssz <= b.length &&
            off <= Int.MaxValue.toLong) {
          offs += off.toInt
          szs += ssz
        }
        off += ssz; k += 1; sample += 1
      }
      c += 1
    }
    Some(Mp4(width, height, codec, offs.result(), szs.result()))
  }

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Long = (u8(b, i) << 8 | u8(b, i + 1)).toLong
  private def le16(b: Array[Byte], i: Int): Long = (u8(b, i + 1) << 8 | u8(b, i)).toLong
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && u8(b, 0) == 0x89 && u8(b, 1) == 'P' && u8(b, 2) == 'N' &&
      u8(b, 3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
      u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  private def sniffPng(b: Array[Byte]): Sniffed =
    // bytes 12..15 must name the IHDR chunk (always first per the spec)
    if (u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R')
      Sniffed("png", be32(b, 16), be32(b, 20))
    else Bin

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  private def sniffJpeg(b: Array[Byte]): Sniffed = {
    // walk marker segments until a start-of-frame header
    var i = 2
    while (i + 9 < b.length && u8(b, i) == 0xff) {
      // spec-legal fill: markers may be preceded by any run of 0xFF bytes
      while (i + 9 < b.length && u8(b, i + 1) == 0xff) i += 1
      val m = u8(b, i + 1)
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return Sniffed("jpeg", be16(b, i + 7), be16(b, i + 5))
      // entropy-coded data (SOS) or end-of-image: dimensions not in view —
      // stop rather than misparse scan bytes as segments
      if (m == 0xda || m == 0xd9) return Sniffed("jpeg", 0L, 0L)
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // no payload
      else i += 2 + be16(b, i + 2).toInt
    }
    Sniffed("jpeg", 0L, 0L) // SOI present but no frame header in the bytes
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
      u8(b, 3) == '8' && (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a'

  private def sniffGif(b: Array[Byte]): Sniffed =
    Sniffed("gif", le16(b, 6), le16(b, 8))
}
