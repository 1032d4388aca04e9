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
    else Bin

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
