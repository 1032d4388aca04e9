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
