package graft.functions

/** Pure-JVM media container header parsers — the real decode kernel for the
  * multimodal pipeline's metadata stage. No native codecs: these read the
  * container FORMAT headers byte-by-byte (magic numbers, dimension fields,
  * fmt chunks) per the public format specifications:
  *  - PNG: 8-byte signature + IHDR chunk (width/height, big-endian u32)
  *  - JPEG: FFD8 + marker walk to a SOFn frame header (height, width u16)
  *  - GIF: GIF87a/89a logical screen descriptor (little-endian u16 dims) +
  *    block walk counting image descriptors (frame count)
  *  - WAV: RIFF/WAVE chunk walk to `fmt ` (sample rate, channels, bits) and
  *    `data` (declared payload size)
  *
  * Parsers return None on anything malformed rather than throwing — a media
  * scan at 100 TB meets corrupt payloads and must route them to a quarantine
  * column, not kill the stage. Declared sizes are read from headers without
  * requiring the full body to be present (metadata probing of a stream
  * head, the way `ffprobe`-style tools read dimensions without decoding).
  */
object MediaHeaders {

  /** Parsed image container metadata. */
  final case class ImageMeta(format: String, width: Int, height: Int, frames: Int)

  /** Parsed WAV metadata; `durationMicros` derives from the declared data
    * size: bytes * 8 / (rate * channels * bits) seconds, in integer µs.
    */
  final case class AudioMeta(
      format: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, dataBytes: Long) {
    def durationMicros: Long = {
      val bitsPerSecond = sampleRate.toLong * channels * bitsPerSample
      if (bitsPerSecond <= 0) 0L else dataBytes * 8L * 1000000L / bitsPerSecond
    }
  }

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 4) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
    v
  }
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 3
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i + n > b.length) "" else new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  /** Container sniffing by magic number. */
  def detect(p: Array[Byte]): Option[String] =
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && ascii(p, 1, 3) == "PNG") Some("png")
    else if (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) Some("jpeg")
    else if (p.length >= 6 && (ascii(p, 0, 6) == "GIF87a" || ascii(p, 0, 6) == "GIF89a")) Some("gif")
    else if (p.length >= 12 && ascii(p, 0, 4) == "RIFF" && ascii(p, 8, 4) == "WAVE") Some("wav")
    else None

  /** PNG IHDR: signature(8) + length(4) + "IHDR" + width(4) + height(4). */
  def parsePng(p: Array[Byte]): Option[ImageMeta] =
    if (p.length < 24 || ascii(p, 12, 4) != "IHDR") None
    else Some(ImageMeta("png", u32be(p, 16).toInt, u32be(p, 20).toInt, 1))

  /** JPEG marker walk to the first SOFn (C0-C3, C5-C7, C9-CB, CD-CF):
    * segment layout FF marker len(2, includes itself) precision(1)
    * height(2) width(2).
    */
  def parseJpeg(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < p.length) {
      if ((p(i) & 0xff) != 0xff) return None // marker desync
      val marker = p(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else if (marker == 0xd9) return None // EOI before any SOF
      else {
        if (i + 3 >= p.length) return None
        val len = u16be(p, i + 2)
        if (len < 2) return None
        val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 9 > p.length) return None
          return Some(ImageMeta("jpeg", u16be(p, i + 7), u16be(p, i + 5), 1))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF logical screen descriptor + block walk counting image descriptors
    * (0x2C), skipping extensions (0x21) and color tables, until the trailer
    * (0x3B) or end of payload.
    */
  def parseGif(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length < 13) return None
    val width = u16le(p, 6)
    val height = u16le(p, 8)
    val packed = p(10) & 0xff
    var i = 13
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 0x07) + 1)) // global color table
    var frames = 0
    var done = false
    def skipSubBlocks(): Boolean = {
      while (i < p.length && p(i) != 0) i += 1 + (p(i) & 0xff) // size byte + data
      if (i < p.length) { i += 1; true } else false // block terminator
    }
    while (!done && i < p.length) {
      (p(i) & 0xff) match {
        case 0x2c => // image descriptor: 9 bytes after the separator
          if (i + 10 > p.length) { done = true }
          else {
            frames += 1
            val lp = p(i + 9) & 0xff
            i += 10
            if ((lp & 0x80) != 0) i += 3 * (1 << ((lp & 0x07) + 1)) // local color table
            if (i < p.length) i += 1 // LZW minimum code size
            if (!skipSubBlocks()) done = true
          }
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          if (!skipSubBlocks()) done = true
        case 0x3b => done = true // trailer
        case _ => done = true // junk — stop counting, keep what we have
      }
    }
    Some(ImageMeta("gif", width, height, frames))
  }

  /** RIFF/WAVE chunk walk: chunks are id(4) + size(4, little-endian) + data
    * (word-aligned). Reads `fmt ` fields and the DECLARED `data` size —
    * the data bytes themselves need not be present.
    */
  def parseWav(p: Array[Byte]): Option[AudioMeta] = {
    if (p.length < 12 || ascii(p, 0, 4) != "RIFF" || ascii(p, 8, 4) != "WAVE") return None
    // Long cursor: a chunk size is an UNSIGNED u32 — casting it to Int could
    // go negative and walk the cursor backwards (infinite loop / OOB crash
    // on a crafted payload); as a Long the advance is always ≥ 8 forward.
    var i = 12L
    var rate = 0; var channels = 0; var bits = 0
    var dataBytes = -1L
    var sawFmt = false
    while (i + 8 <= p.length && (dataBytes < 0 || !sawFmt)) {
      val at = i.toInt // safe: i + 8 <= p.length <= Int.MaxValue
      val id = ascii(p, at, 4)
      val size = u32le(p, at + 4)
      if (id == "fmt " && i + 24 <= p.length) {
        channels = u16le(p, at + 10)
        rate = u32le(p, at + 12).toInt
        bits = u16le(p, at + 22)
        sawFmt = true
      }
      if (id == "data") dataBytes = size
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (!sawFmt) None
    else Some(AudioMeta("wav", rate, channels, bits, math.max(0L, dataBytes)))
  }

  /** One-stop parse: sniff the container, parse its header. Images map to
    * (width, height, frames); WAV maps to (rate, channels, bits, duration).
    */
  def parseImage(p: Array[Byte]): Option[ImageMeta] = detect(p) match {
    case Some("png") => parsePng(p)
    case Some("jpeg") => parseJpeg(p)
    case Some("gif") => parseGif(p)
    case _ => None
  }
}
