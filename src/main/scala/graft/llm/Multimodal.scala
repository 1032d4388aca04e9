package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension set, SURVEY.md §2.3):
  * media payloads ride as opaque `binary` columns (the reference's `bytea`
  * mapping, `pyopenetl/operations.py:253`) with typed metadata alongside.
  *
  * The decode step is a real header decoder ([[MediaCodec]]): container
  * format and pixel dimensions parsed from the payload's leading bytes
  * (PNG IHDR / JPEG SOF / GIF screen descriptor), plus content hash and
  * byte length. It runs through the typed-batch `mapPartitions` shape —
  * one decoder scope per partition, streaming iterator, no per-row setup.
  * The pixel step ([[resize]]) is a full JDK-ImageIO decode/resample/
  * re-encode; only video demux remains a documented seam.
  */
object Multimodal extends QueryModule {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, sha256: String,
                       format: String, width: Long, height: Long)

  /** Decode one payload with a caller-owned digest (hoisted per partition
    * in [[decodeMeta]] — provider lookup per row is exactly the setup cost
    * the batch shape exists to avoid; digest(byte[]) resets afterwards, so
    * the shared instance is always clean). */
  def decode(md: java.security.MessageDigest, docId: Long,
             payload: Array[Byte]): MediaMeta = {
    val hex = java.util.HexFormat.of().formatHex(md.digest(payload))
    val s   = MediaCodec.sniff(payload)
    MediaMeta(docId, payload.length.toLong, hex, s.format, s.width, s.height)
  }

  /** Batch-shaped decode: one pass per partition over a streaming iterator —
    * the Scala analog of a pandas-batch UDF, keeping per-partition (not
    * per-row) decoder setup.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      // per-partition decoder init: one digest instance for the partition
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map(m => decode(md, m.doc_id, m.payload))
    }.toDF()
  }

  case class MediaFeatures(doc_id: Long, byte_len: Long, mean_byte: Double,
                           entropy: Double, printable_ratio: Double)
  case class ResizedMedia(doc_id: Long, format: String,
                          src_width: Long, src_height: Long,
                          dst_width: Long, dst_height: Long,
                          payload: Array[Byte])
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Content feature extraction — real features, no codec needed: byte
    * histogram statistics (mean, Shannon entropy, printable ratio) are the
    * standard cheap signals for corpus triage (compressed-vs-text,
    * truncated payloads, binary junk). Same per-partition batch shape as
    * [[decodeMeta]]; a learned-embedding extractor slots into the same
    * iterator.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        val b = m.payload
        val n = b.length.max(1)
        val hist = new Array[Long](256)
        var sum = 0L; var printable = 0L
        b.foreach { x =>
          val u = x & 0xff
          hist(u) += 1; sum += u
          if (u >= 32 && u < 127) printable += 1
        }
        var h = 0.0
        hist.foreach { c =>
          if (c > 0) { val p = c.toDouble / n; h -= p * math.log(p) }
        }
        MediaFeatures(m.doc_id, b.length.toLong, sum.toDouble / n,
          h / math.log(2.0), printable.toDouble / n)
      }
    }.toDF()
  }

  /** Pixel resize through the per-partition batch shape. The default codec
    * is the real JDK one ([[imageResizePixels]]): decode PNG/JPEG/GIF via
    * `javax.imageio`, bilinear-resample to (dstW, dstH), re-encode PNG. The
    * `resizePixels` seam stays so a native codec (libjpeg-turbo JNI, GPU
    * batch decoder) can replace the JDK path without touching the plumbing.
    * Non-decodable payloads yield an empty output payload — never an
    * exception: malformed media must not kill a 100 TB scan (the header
    * metadata columns still carry what the sniffer saw).
    */
  def resize(media: DataFrame, dstW: Long, dstH: Long,
             resizePixels: (Array[Byte], Long, Long) => Array[Byte] =
               imageResizePixels): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        val s = MediaCodec.sniff(m.payload)
        ResizedMedia(m.doc_id, s.format, s.width, s.height, dstW, dstH,
          resizePixels(m.payload, dstW, dstH))
      }
    }.toDF()
  }

  /** Real pixel resampling on the JDK's built-in codecs (PNG/JPEG/GIF/BMP —
    * no external dependency): decode, bilinear `drawImage` onto an RGB
    * canvas, re-encode as PNG (lossless, so the output is deterministic
    * across JDK builds in a way a JPEG re-encode would not be). Returns an
    * empty array for anything `ImageIO` cannot decode (truncated or
    * non-image bytes) rather than throwing.
    */
  def imageResizePixels(payload: Array[Byte], w: Long, h: Long): Array[Byte] =
    try {
      // explicit memory-cached streams: the ImageIO default spools through
      // temp files on local disk, which an executor must not do per row.
      // Both streams are closed deterministically — their cache segments
      // must not wait for GC on a per-row hot path.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // no explicit close: ImageIO.read(ImageInputStream) closes the
      // stream itself after the read, success or not (a second close
      // throws and would mask the decode result)
      val img = javax.imageio.ImageIO.read(in)
      if (img == null || w <= 0 || h <= 0) Array.emptyByteArray
      else {
        val dst = new java.awt.image.BufferedImage(
          w.toInt, h.toInt, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w.toInt, h.toInt, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try javax.imageio.ImageIO.write(dst, "png", out) finally out.close()
        bos.toByteArray
      }
    } catch { case scala.util.control.NonFatal(_) => Array.emptyByteArray }

  /** Video frame sampling. Two containers demux for REAL:
    *  - Y4M (YUV4MPEG2) — ASCII header + raw planar frames
    *    ([[MediaCodec.demuxY4m]]): no codec needed at all;
    *  - AVI (RIFF) — [[MediaCodec.demuxAvi]] walks the chunk tree and
    *    yields per-frame payloads; for MJPEG AVIs each sampled frame is a
    *    complete JPEG, decodable by the same JDK codec [[resize]] uses —
    *    a COMPRESSED container covered end to end, pure JVM.
    * Up to `n` evenly spaced actual frames come back with their true
    * frame numbers, the way a training pipeline samples stills.
    * MP4 is demuxed for real too (ISO BMFF sample tables — true frame
    * byte ranges and indices); a motion-JPEG MP4 (sample entry 'jpeg')
    * therefore decodes to PIXELS end to end with the same JDK codec
    * (MultimodalSpec pins it), while inter-coded payloads (avc1 …) are
    * codec bitstream whose pixel decode still needs external libraries —
    * that decode step is the remaining seam, and it is codec-shaped,
    * not container-shaped. Payloads no demuxer recognizes fall back to the
    * deterministic byte-range slice into `n` equal chunks, clearly
    * distinguishable by its contiguous 0..n-1 frame indices. Either way
    * the shape is the one-to-many typed flatMap — one input row fanning
    * out to a row per frame, one decoder scope per partition.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def sampled(count: Int)(frameAt: Int => Array[Byte])(docId: Long)
        : Iterator[Frame] = {
      val take = math.min(n, count)
      (0 until take).iterator.map { i =>
        val fi = (count.toLong * i / take).toInt // real frame number
        Frame(docId, fi, frameAt(fi))
      }
    }
    media.as[MediaIn].mapPartitions { it =>
      it.flatMap { m =>
        MediaCodec.demuxY4m(m.payload) match {
          case Some(v) if v.frameOffsets.nonEmpty =>
            sampled(v.frameOffsets.length) { fi =>
              val off = v.frameOffsets(fi)
              java.util.Arrays.copyOfRange(m.payload, off, off + v.frameSize)
            }(m.doc_id)
          case _ => MediaCodec.demuxAvi(m.payload) match {
            case Some(v) if v.frameOffsets.nonEmpty =>
              sampled(v.frameOffsets.length) { fi =>
                val off = v.frameOffsets(fi)
                java.util.Arrays.copyOfRange(m.payload, off,
                  off + v.frameSizes(fi))
              }(m.doc_id)
            case _ => MediaCodec.demuxMp4(m.payload) match {
              case Some(v) if v.frameOffsets.nonEmpty =>
                sampled(v.frameOffsets.length) { fi =>
                  val off = v.frameOffsets(fi)
                  java.util.Arrays.copyOfRange(m.payload, off,
                    off + v.frameSizes(fi))
                }(m.doc_id)
              case _ =>
                val len = m.payload.length
                if (len == 0) Iterator.empty
                else (0 until n).iterator.map { i =>
                  val from = (len.toLong * i / n).toInt
                  val to   = (len.toLong * (i + 1) / n).toInt
                  Frame(m.doc_id, i,
                    java.util.Arrays.copyOfRange(m.payload, from,
                      to.max(from)))
                }
            }
          }
        }
      }
    }.toDF()
  }

  case class MediaHash(doc_id: Long, phash: Long, decoded: Boolean)

  case class SceneCut(doc_id: Long, frame_idx: Long, diff_sum: Long)

  /** Scene-cut detection over decoded video frames — the temporal
    * member of the multimodal family (q245 hashes stills, q273
    * fingerprints audio; this segments VIDEO into shots, the unit a
    * frame-sampling curation pipeline actually wants — sampling inside
    * one shot yields near-identical frames, sampling per shot yields
    * coverage). Detector: the mean-absolute luma difference between
    * consecutive Y planes, a cut when the per-pixel mean ≥ `thr`
    * (Zhang/Kankanhalli/Smoliar 1993's pairwise-difference baseline).
    * INTEGER-exact end to end: the diff is an exact long sum of byte
    * differences — no floats, so the oracle's closed form matches
    * hash-for-hash. Scan-local per row (zero shuffles at any scale);
    * non-decodable payloads yield no rows, never an exception (the
    * 100 TB scan survival rule).
    */
  def sceneCuts(media: DataFrame, thr: Int = 30): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.flatMap { m =>
        MediaCodec.demuxY4m(m.payload) match {
          case Some(v) if v.frameOffsets.length >= 2 =>
            val ySize = v.width * v.height
            (1 until v.frameOffsets.length).iterator.flatMap { fi =>
              val o0 = v.frameOffsets(fi - 1)
              val o1 = v.frameOffsets(fi)
              var s = 0L
              var k = 0
              while (k < ySize) {
                s += math.abs((m.payload(o1 + k) & 0xff) -
                  (m.payload(o0 + k) & 0xff))
                k += 1
              }
              if (s >= thr.toLong * ySize) Some(SceneCut(m.doc_id, fi, s))
              else None
            }
          case _ => Iterator.empty
        }
      }
    }.toDF()
  }

  /** Deterministic synthetic Y4M corpus for the declared scene-cut
    * query: the parquet fixtures carry no video bytes, so each doc_id
    * renders to a REAL YUV4MPEG2 stream (mono chroma, 16×16, 12
    * frames) — the decode half then exercises the production
    * [[MediaCodec.demuxY4m]] header/frame walker, not a stub. Three
    * planted shots with luma levels l1 = 40 + (id%3)·10,
    * l2 = 120 + (id%5)·8, l3 = 200 + (id%4)·5 and cuts at frames
    * c1 = 3 + id%3 and c2 = 8 + id%2: within-shot frame diffs are
    * exactly 0 and the cut diffs are (l2−l1)·256 ≥ 48·256 and
    * (l3−l2)·256 ≥ 48·256 — far above the 30/pixel threshold, and
    * every cut position and diff value has a closed form in doc_id
    * the DuckDB oracle states directly, so the whole render→demux→
    * detect chain is hash-checked.
    */
  def syntheticY4mSceneCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h, n) = (16, 16, 12)
        val l1 = (40 + (id % 3) * 10).toInt
        val l2 = (120 + (id % 5) * 8).toInt
        val l3 = (200 + (id % 4) * 5).toInt
        val c1 = (3 + id % 3).toInt
        val c2 = (8 + id % 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        bos.write("YUV4MPEG2 W16 H16 F25:1 Cmono\n".getBytes("US-ASCII"))
        var f = 0
        while (f < n) {
          bos.write("FRAME\n".getBytes("US-ASCII"))
          val l = if (f < c1) l1 else if (f < c2) l2 else l3
          bos.write(Array.fill(w * h)(l.toByte))
          f += 1
        }
        MediaIn(id, bos.toByteArray)
      }
    }.toDF()
  }

  /** Perceptual average-hash (aHash) over a real pixel decode: downsample
    * to 8×8 grayscale via the same JDK bilinear path [[resize]] uses,
    * threshold each cell at the grid mean → a 64-bit fingerprint whose
    * HAMMING distance tracks visual similarity (re-encodes, light crops,
    * small noise keep most bits; byte-level hashes keep none). The
    * near-dup key for image corpora — content SHA catches only exact
    * bytes. Non-decodable payloads return phash 0 with decoded=false,
    * never an exception (the 100 TB scan survival rule). Scan-local per
    * row — zero shuffles at any scale.
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m => MediaHash(m.doc_id, aHash64(m.payload),
        aHashDecodes(m.payload)) }
    }.toDF()
  }

  private def decode8x8Gray(payload: Array[Byte]): Option[Array[Int]] =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val img = javax.imageio.ImageIO.read(in)
      if (img == null) None
      else {
        val dst = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null)
        g.dispose()
        Some(Array.tabulate(64) { i =>
          val rgb = dst.getRGB(i % 8, i / 8)
          // integer luma (BT.601 weights scaled by 1000) — deterministic
          // across JVMs where a float blend would not be
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        })
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def aHashDecodes(payload: Array[Byte]): Boolean =
    decode8x8Gray(payload).isDefined

  /** The 64-bit aHash: bit i set iff cell i's luma >= the 64-cell mean. */
  def aHash64(payload: Array[Byte]): Long =
    decode8x8Gray(payload).fold(0L) { gray =>
      val mean = gray.sum / 64 // integer mean — exact, engine-independent
      gray.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v >= mean) acc | (1L << i) else acc
      }
    }

  /** Near-duplicate image pairs by perceptual-hash Hamming distance <=
    * `maxDist`, at scale: the 64-bit hash splits into `maxDist + 1`
    * disjoint bands — pigeonhole guarantees any pair within the distance
    * agrees EXACTLY on at least one band — so candidates come from
    * equi-joining band buckets (the MinHash-LSH shape, but with a 100%
    * recall guarantee, not probabilistic), and the exact popcount-of-XOR
    * confirms. No all-pairs join at any scale; bucket skew is bounded by
    * how many images truly share a 16-bit perceptual band.
    */
  def nearDupByHamming(hashes: DataFrame, maxDist: Int): DataFrame = {
    // banding contract: width = 64/(maxDist+1) must land in [2, 32].
    // maxDist = 0 would give width 64, where (1L << 64) wraps to mask 0
    // and every image lands in one bucket (the all-pairs join this
    // method exists to avoid) — use an exact equi-join on phash for
    // that; maxDist >= 32 gives width <= 1 with the same degeneracy.
    require(maxDist >= 1 && maxDist <= 31,
      s"maxDist must be in [1, 31] (got $maxDist); " +
        "use an exact phash equi-join for maxDist = 0")
    val nBands = maxDist + 1
    val width = 64 / nBands
    val banded = hashes.filter(col("decoded"))
      .select(col("doc_id"), col("phash"), explode(array(
        (0 until nBands).map(b => struct(lit(b).as("band"),
          shiftright(col("phash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("a_id"), col("phash").as("a_hash"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("b_id"), col("phash").as("b_hash"))
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Deterministic synthetic PNG corpus for the declared perceptual-hash
    * dedup query: the parquet fixtures carry no image bytes, so each
    * doc_id renders to a REAL 32×32 PNG (JDK ImageIO encode — the decode
    * half of the pipeline then exercises the production ImageIO path, not
    * a stub). The pattern is an 8×8 block grid keyed by doc_id / 8 (a
    * splitmix-mixed bit per block) with ONE block flipped by doc_id % 64:
    * docs in the same group of 8 are visual near-dups at Hamming
    * distance exactly 2, groups differ in ~32 bits — a planted
    * ground-truth the spec checks recall against. Blocks are 4×4 uniform
    * pixels, so the 32→8 bilinear downsample samples strictly inside one
    * block per aHash cell (dst center i maps to src 4i+1.5) and the
    * bimodal lumas (25/230) sit far from the grid mean: the planted
    * geometry survives the decode bit-exactly on any JVM.
    */
  def syntheticPngCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def mix64(z0: Long): Long = { // splitmix64 finalizer — scan-local
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val group = id / 8
        val flip = (id % 64).toInt
        val img = new java.awt.image.BufferedImage(
          32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var cell = 0
        while (cell < 64) {
          val bit = ((mix64(group * 64 + cell) & 1L) == 1L) ^ (cell == flip)
          val l = if (bit) 230 else 25
          val rgb = (l << 16) | (l << 8) | l
          val bx = (cell % 8) * 4; val by = (cell / 8) * 4
          var y = by
          while (y < by + 4) {
            var x = bx
            while (x < bx + 4) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          cell += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaIn(id, bos.toByteArray)
      }
    }.toDF()
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Long, n_channels: Long,
                           n_samples: Long, peak_abs: Long, n_zero_cross: Long,
                           energy_sum: Long, active_frames: Long)

  /** Deterministic synthetic WAV corpus for the declared audio-features
    * query: the parquet fixtures carry no audio bytes, so each doc_id
    * renders to a REAL RIFF/WAVE payload (canonical 44-byte header +
    * 16-bit little-endian PCM) — the decode half of the pipeline then
    * exercises the production chunk walker and sample reader, not a stub.
    * The waveform is integer-exact (a square wave never touches floats):
    * 800 mono samples at 8 kHz, `sil = (id%4)·100` leading silent
    * samples, then amplitude `amp = 8000 + (id%7)·1000` alternating sign
    * every `hp = 10 + (id%5)·5` samples. Every feature the kernel
    * extracts from the BYTES therefore has a closed form in doc_id — the
    * DuckDB oracle states that closed form, so the full
    * render→encode→demux→decode→feature chain is hash-checked: any
    * byte-layout or parser bug turns the driver row red.
    */
  def syntheticWavCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = 800
        val amp = (8000 + (id % 7) * 1000).toInt
        val hp = (10 + (id % 5) * 5).toInt
        val sil = ((id % 4) * 100).toInt
        val dataLen = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)        // PCM, mono
          .putInt(8000).putInt(16000)     // rate, byte rate
          .putShort(2).putShort(16)       // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var s = 0
        while (s < n) {
          val x =
            if (s < sil) 0
            else if (((s - sil) / hp) % 2 == 0) amp
            else -amp
          bb.putShort(x.toShort)
          s += 1
        }
        MediaIn(id, bb.array())
      }
    }.toDF()
  }

  /** Audio feature extraction over real WAV bytes — the audio analog of
    * [[extractFeatures]]: demux the RIFF chunks, read channel-0 PCM16
    * samples, and compute the triage features an audio corpus filters on
    * (peak for clipping/silence, zero-crossing count as the pitch proxy,
    * exact energy, count of non-silent fixed-size frames). All integer
    * arithmetic — no float drift anywhere. Same per-partition batch
    * shape as the image paths; payloads that don't demux as PCM WAV drop
    * out (never an exception). Scan-local per row — zero shuffles.
    */
  def audioFeatures(media: DataFrame, frameSize: Int = 200): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.flatMap { m =>
        MediaCodec.demuxWav(m.payload).map { w =>
          val xs = MediaCodec.pcm16Samples(m.payload, w)
          var peak = 0L; var zc = 0L; var energy = 0L
          var frames = 0L; var frameEnergy = 0L
          var i = 0
          while (i < xs.length) {
            val x = xs(i).toLong
            val ax = math.abs(x)
            if (ax > peak) peak = ax
            if (i > 0 && xs(i - 1).toLong * x < 0) zc += 1
            energy += x * x
            frameEnergy += x * x
            if ((i + 1) % frameSize == 0 || i == xs.length - 1) {
              if (frameEnergy > 0) frames += 1
              frameEnergy = 0
            }
            i += 1
          }
          AudioFeatures(m.doc_id, w.sampleRate.toLong, w.channels.toLong,
            xs.length.toLong, peak, zc, energy, frames)
        }
      }
    }.toDF()
  }

  /** Audio content hash — exact dedup at SAMPLE grain, not file grain: a
    * 64-bit FNV-1a over the PCM payload bytes only, so the same recording
    * re-wrapped in a different container (extra LIST/INFO chunks, other
    * header layout) still collapses to one key where a file-level SHA
    * would not. Scan-local per row; the hash is the shuffle key for any
    * downstream dedup. Non-PCM payloads drop out (the seam rule).
    */
  def audioContentHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.flatMap { m =>
        MediaCodec.demuxWav(m.payload).map { w =>
          val end = w.dataOffset +
            w.nSamples * w.channels * (w.bitsPerSample / 8)
          var h = 0xcbf29ce484222325L // FNV-1a offset basis
          var i = w.dataOffset
          while (i < end) {
            h = (h ^ (m.payload(i) & 0xff)) * 0x100000001b3L
            i += 1
          }
          (m.doc_id, h)
        }
      }
    }.toDF("doc_id", "fp")
  }

  /** Fuzzy audio fingerprint — the Haitsma-Kalker (2002) shape in pure
    * integer arithmetic, completing the audio family the way q245's
    * aHash completes images: q259's sample-grain FNV is EXACT (one
    * flipped byte splits the class), this is ROBUST — bit f is the sign
    * of the consecutive frame-ENERGY difference E(f+1) > E(f) over 65
    * frames of 12 samples, so any uniform gain change (volume
    * normalization, the most common audio re-encode) scales every frame
    * energy by the same factor and leaves all 64 comparison bits — the
    * whole fingerprint — untouched, where the exact hash sees a
    * different recording. Energies are exact integer Σx² (≤ 12·2³⁰ per
    * frame, no Long overflow), computed scan-local per clip off the same
    * demuxWav→pcm16Samples path q258/q259 ride. Output columns match
    * [[perceptualHash]] so [[nearDupByHamming]]'s pigeonhole-banded
    * join is the shared downstream; undecodable payloads report
    * decoded=false and drop there (the seam rule).
    */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        MediaCodec.demuxWav(m.payload) match {
          case Some(w) if w.bitsPerSample == 16 && w.channels == 1 =>
            val xs = MediaCodec.pcm16Samples(m.payload, w)
            val frame = 12
            val nFrames = math.min(xs.length / frame, 65)
            if (nFrames < 2) (m.doc_id, 0L, false)
            else {
              val e = new Array[Long](nFrames)
              var i = 0
              while (i < nFrames * frame) {
                e(i / frame) += xs(i).toLong * xs(i)
                i += 1
              }
              var fp = 0L
              var f = 0
              while (f < nFrames - 1) {
                if (e(f + 1) > e(f)) fp |= (1L << f)
                f += 1
              }
              (m.doc_id, fp, true)
            }
          case _ => (m.doc_id, 0L, false)
        }
      }
    }.toDF("doc_id", "phash", "decoded")
  }

  /** Planted-geometry WAV corpus for the fuzzy-fingerprint contract —
    * the q245 recipe at audio grain. Each doc renders 65 frames × 12
    * samples of square wave whose per-frame amplitude follows a ±1 walk
    * r(f) driven by a 64-bit pattern: bit f of the pattern IS the sign
    * of the energy difference [[audioFingerprint]] recovers (E = 12a²,
    * a(f) strictly monotone in r(f)). Groups of 8 consecutive doc_ids
    * share a mix64-keyed base pattern; member m flips bit (id%64), so
    * same-group fingerprints sit at Hamming EXACTLY 2 and distinct
    * groups ~32 bits apart — the closed form the oracle states in
    * doc_id arithmetic. Each clip also carries a per-doc volume factor
    * (×4..×6, exact integer product): same-group members have DIFFERENT
    * gains and different PCM bytes — q259's exact hash splits them, the
    * robust fingerprint must still collapse them, which is the entire
    * point of the operator.
    */
  def syntheticWavFpCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def mix64(z0: Long): Long = { // splitmix64 finalizer — scan-local
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val group = id / 8
        val flip = (id % 64).toInt
        val vol = (4 + (id % 3)).toInt // gain ×4..×6 — fingerprint-invisible
        val nFrames = 65; val frame = 12
        val n = nFrames * frame
        val dataLen = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)        // PCM, mono
          .putInt(8000).putInt(16000)     // rate, byte rate
          .putShort(2).putShort(16)       // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        // amplitude walk: r ∈ [0, 128] (start 64, 64 ±1 steps), so
        // a = (250 + 40r)·vol ≤ (250 + 5120)·6 = 32220 < 2¹⁵ — never
        // clips, and a is strictly monotone in r at any fixed vol
        var r = 64
        var f = 0
        while (f < nFrames) {
          val a = (250 + 40 * r) * vol
          var s = 0
          while (s < frame) {
            val x = if (((f * frame + s) / 3) % 2 == 0) a else -a
            bb.putShort(x.toShort)
            s += 1
          }
          if (f < nFrames - 1) {
            val bit = ((mix64(group * 64 + f) & 1L) == 1L) ^ (f == flip)
            r = if (bit) r + 1 else r - 1
          }
          f += 1
        }
        MediaIn(id, bb.array())
      }
    }.toDF()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Audio exact-dedup census at sample grain, WITH an oracle: the
    // synthetic waveform is a function of (doc_id%7, doc_id%5, doc_id%4),
    // so the sample-content equivalence classes have a closed form the
    // oracle groups by directly — while the engine groups by the REAL
    // byte-level FNV of each clip's PCM payload. The row is green only if
    // the hash respects exactly those classes: a collision (classes
    // merged) or a render/demux instability (classes split) turns it
    // red. The hash itself stays out of the output (engine-specific, the
    // q44 sketch convention); each class reports its min-doc_id survivor
    // and size — the q122 survivor-pick shape for audio.
    "q259_audio_dedup_census" -> { (s, dir) =>
      audioContentHash(syntheticWavCorpus(Tables.t(s, dir, "documents")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("rep_doc_id"),
          count(lit(1)).as("n_clips"))
        .select(col("rep_doc_id"), col("n_clips"))
        .orderBy("rep_doc_id")
    },

    // Audio features end to end, WITH an oracle: synthesize PCM16 WAVs,
    // demux + decode + featurize through the real byte kernel, and check
    // against the closed form of the planted waveform (the q257 fidelity
    // argument — the container must be value-invisible). Scale shape:
    // render and featurize are both scan-local mapPartitions; the only
    // exchange is the output sort.
    "q258_audio_features" -> { (s, dir) =>
      audioFeatures(syntheticWavCorpus(Tables.t(s, dir, "documents")))
        .orderBy("doc_id")
    },

    // Perceptual-hash image dedup, declared end-to-end WITH an oracle
    // (r9 — the q258 closed-form argument): DuckDB has no ImageIO, but
    // the planted geometry does not need one — syntheticPngCorpus puts
    // each group of 8 consecutive doc_ids at pairwise Hamming exactly 2
    // and distinct groups ~32 bits apart (mix64-keyed), so the full
    // render→PNG-encode→ImageIO-decode→aHash→banded-join chain must
    // reproduce exactly the same-group pair set at distance 2 — which
    // the oracle states directly in doc_id arithmetic. Any decoder,
    // hash, or banding bug turns the row red (MultimodalSpec pins the
    // same truth in-process). Scale shape: hash is scan-local;
    // candidates come from the 4×16-bit band buckets
    // (pigeonhole-complete recall), never an all-pairs join; planted
    // dup groups are size-8, so output stays corpus-linear.
    "q245_phash_dedup" -> { (s, dir) =>
      val media = syntheticPngCorpus(Tables.t(s, dir, "documents"))
      nearDupByHamming(perceptualHash(media), 3)
        .orderBy("a_id", "b_id")
    },

    // Fuzzy audio fingerprint dedup, declared end-to-end WITH an oracle
    // (r10 — the q245 argument at audio grain): the planted amplitude
    // walk puts each group of 8 consecutive doc_ids at fingerprint
    // Hamming EXACTLY 2 and distinct groups ~32 bits apart, so the full
    // render→RIFF-demux→PCM-decode→frame-energy-sign→banded-join chain
    // must reproduce exactly the same-group pair set — stated by the
    // oracle in doc_id arithmetic. Same-group members carry DIFFERENT
    // volume gains (different PCM bytes — q259's exact hash splits
    // them); the energy-difference signs are gain-invariant, which is
    // the robustness the operator exists for. Scale shape: fingerprint
    // is scan-local; candidates come from the 4×16-bit band buckets
    // (pigeonhole-complete recall at maxDist 3), never an all-pairs
    // join; planted dup groups are size-8, so output stays
    // corpus-linear.
    "q273_audio_fp_neardup" -> { (s, dir) =>
      val media = syntheticWavFpCorpus(Tables.t(s, dir, "documents"))
      nearDupByHamming(audioFingerprint(media), 3)
        .orderBy("a_id", "b_id")
    },
    // Byte-level content features through the batch path — real features
    // (histogram stats), oracle-checkable since DuckDB can state the same
    // arithmetic over the text bytes.
    "q73_media_features" -> { (s, dir) =>
      val media = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      extractFeatures(media)
        .select(col("doc_id"), col("byte_len"),
          round(col("mean_byte"), 4).as("mean_byte"),
          round(col("entropy"), 4).as("entropy"),
          round(col("printable_ratio"), 4).as("printable_ratio"))
        .orderBy("doc_id")
    },

    // Binary payload + metadata extraction through the typed batch path.
    // The fixture payloads are text bytes, so the sniffer classifies every
    // row as opaque `bin` with 0x0 dimensions — the oracle states exactly
    // that; the image-header paths are ScalaTest-covered with real
    // PNG/JPEG/GIF header bytes (MultimodalSpec).
    "q41_multimodal_meta" -> { (s, dir) =>
      val media = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      decodeMeta(media).orderBy("doc_id")
    },

    // Video scene-cut detection over REAL Y4M decodes — three planted
    // shots per doc; every cut position and integer diff value has a
    // closed form in doc_id (see syntheticY4mSceneCorpus), so the whole
    // render→demux→detect chain is oracle-checked.
    "q299_scene_cuts" -> { (s, dir) =>
      sceneCuts(syntheticY4mSceneCorpus(Tables.t(s, dir, "documents")))
        .orderBy("doc_id", "frame_idx")
    })

  override def oracles: Map[String, String] = Map(
    // the planted shot geometry in doc_id arithmetic: cuts exactly at
    // c1/c2 with diff = luma step × 256 pixels; within-shot diffs are 0
    "q299_scene_cuts" ->
      """SELECT doc_id, frame_idx, diff_sum FROM (
        |  SELECT doc_id, 3 + doc_id % 3 AS frame_idx,
        |    ((120 + (doc_id % 5) * 8) - (40 + (doc_id % 3) * 10)) * 256
        |      AS diff_sum
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 8 + doc_id % 2,
        |    ((200 + (doc_id % 4) * 5) - (120 + (doc_id % 5) * 8)) * 256
        |  FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // the planted image geometry in doc_id arithmetic: same-8-group
    // pairs at Hamming exactly 2, nothing across groups (patterns are
    // mix64-keyed, ~32 bits apart — far outside maxDist 3)
    "q245_phash_dedup" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(2 AS INTEGER) AS hamming
        |FROM documents a JOIN documents b
        |  ON a.doc_id // 8 = b.doc_id // 8 AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,

    // the planted audio geometry in doc_id arithmetic: same-8-group
    // pairs at fingerprint Hamming exactly 2 (each member flips its own
    // walk bit), nothing across groups (mix64-keyed patterns, ~32 bits
    // apart — far outside maxDist 3); gain differences are invisible to
    // the energy-difference signs by construction
    "q273_audio_fp_neardup" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(2 AS INTEGER) AS hamming
        |FROM documents a JOIN documents b
        |  ON a.doc_id // 8 = b.doc_id // 8 AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,

    // the planted waveform is injective in (amp, hp, sil) — distinct
    // parameter triples give distinct PCM byte strings — so the
    // sample-content classes ARE the doc_id residue classes
    "q259_audio_dedup_census" ->
      """SELECT MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_clips
        |FROM documents
        |GROUP BY doc_id % 7, doc_id % 5, doc_id % 4
        |ORDER BY rep_doc_id""".stripMargin,

    // the closed form of the planted square wave: m = 800 − sil active
    // samples ⇒ peak = amp, energy = m·amp², one crossing at every hp
    // boundary inside the active run (silence→signal is 0·amp, not a
    // sign flip), and a 200-sample frame is silent iff wholly inside
    // the leading silence
    "q258_audio_features" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    8000 + (doc_id % 7) * 1000 AS amp,
        |    10 + (doc_id % 5) * 5 AS hp,
        |    (doc_id % 4) * 100 AS sil
        |  FROM documents),
        |m AS (SELECT doc_id, amp, hp, sil, 800 - sil AS act FROM p)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(800 AS BIGINT) AS n_samples,
        |  CAST(amp AS BIGINT) AS peak_abs,
        |  CAST((act - 1) // hp AS BIGINT) AS n_zero_cross,
        |  CAST(act * amp * amp AS BIGINT) AS energy_sum,
        |  CAST(4 - sil // 200 AS BIGINT) AS active_frames
        |FROM m ORDER BY doc_id""".stripMargin,

    // fixture text is ASCII, so char codes == payload bytes. mean/ratio are
    // exact integer arithmetic; the entropy sum is 30-odd double terms with
    // ~1e-15 spread — far inside the ROUND(.,4) grid (same argument as the
    // cosine oracles).
    "q73_media_features" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(text) + 1),
        |      i -> ASCII(SUBSTRING(text, i, 1)))) AS c
        |  FROM documents),
        |cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
        |base AS (
        |  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS byte_len
        |  FROM documents),
        |stats AS (
        |  SELECT cnt.doc_id,
        |    SUM(cnt.k * cnt.c) AS code_sum,
        |    SUM(CASE WHEN cnt.c BETWEEN 32 AND 126 THEN cnt.k ELSE 0 END)
        |      AS printable,
        |    -SUM((CAST(cnt.k AS DOUBLE) / b.byte_len)
        |         * LN(CAST(cnt.k AS DOUBLE) / b.byte_len)) / LN(2)
        |      AS entropy
        |  FROM cnt JOIN base b ON cnt.doc_id = b.doc_id
        |  GROUP BY cnt.doc_id)
        |SELECT b.doc_id, b.byte_len,
        |  ROUND(CAST(COALESCE(s.code_sum, 0) AS DOUBLE)
        |        / GREATEST(b.byte_len, 1), 4) AS mean_byte,
        |  ROUND(COALESCE(s.entropy, 0.0), 4) AS entropy,
        |  ROUND(CAST(COALESCE(s.printable, 0) AS DOUBLE)
        |        / GREATEST(b.byte_len, 1), 4) AS printable_ratio
        |FROM base b LEFT JOIN stats s ON b.doc_id = s.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q41_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
        |  SHA256(text) AS sha256,
        |  'bin' AS format,
        |  CAST(0 AS BIGINT) AS width,
        |  CAST(0 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
