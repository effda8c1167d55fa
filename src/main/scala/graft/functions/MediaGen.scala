package graft.functions

import java.io.ByteArrayOutputStream

/** Header-accurate synthetic media payload builders. Test/pipeline
  * scaffolding for [[MediaHeaders]]: the containers this emits carry REAL
  * format headers (correct magic numbers, dimension fields, chunk layout),
  * with deterministic filler standing in for compressed pixel/sample data —
  * no codecs exist in this container, and header parsing never needs them.
  * WAV declares its true data size but truncates the body, the "probe the
  * stream head" shape the parser explicitly supports.
  */
object MediaGen {

  private def be16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def be32(o: ByteArrayOutputStream, v: Long): Unit = {
    var k = 3
    while (k >= 0) { o.write(((v >>> (8 * k)) & 0xff).toInt); k -= 1 }
  }
  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def le32(o: ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
  }
  private def asciiBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** PNG: signature + IHDR (real dims) + one raw filler chunk + IEND.
    * Chunk CRCs are zeroed — header probing reads lengths and fields, not
    * checksums.
    */
  def png(width: Int, height: Int, filler: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream(64 + filler.length)
    o.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    be32(o, 13); o.write(asciiBytes("IHDR"))
    be32(o, width.toLong); be32(o, height.toLong)
    o.write(8); o.write(2); o.write(0); o.write(0); o.write(0) // bit depth, color, ...
    be32(o, 0) // CRC (unchecked)
    be32(o, filler.length.toLong); o.write(asciiBytes("IDAT")); o.write(filler); be32(o, 0)
    be32(o, 0); o.write(asciiBytes("IEND")); be32(o, 0)
    o.toByteArray
  }

  /** JPEG: SOI + APP0/JFIF + SOF0 with real dims + EOI (no entropy data). */
  def jpeg(width: Int, height: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(64)
    o.write(0xff); o.write(0xd8) // SOI
    o.write(0xff); o.write(0xe0) // APP0
    be16(o, 16); o.write(asciiBytes("JFIF")); o.write(0)
    o.write(1); o.write(1); o.write(0); be16(o, 1); be16(o, 1); o.write(0); o.write(0)
    o.write(0xff); o.write(0xc0) // SOF0
    be16(o, 11) // len: 2 + 1 + 2 + 2 + 1 + 3*1
    o.write(8) // precision
    be16(o, height); be16(o, width)
    o.write(1); o.write(1); o.write(0x11); o.write(0) // one component
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  /** GIF89a: logical screen descriptor with real dims + `frames` image
    * descriptors (1×1, no color tables, one empty sub-block each) + trailer.
    */
  def gif(width: Int, height: Int, frames: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(32 + frames * 16)
    o.write(asciiBytes("GIF89a"))
    le16(o, width); le16(o, height)
    o.write(0) // packed: no global color table
    o.write(0); o.write(0) // background, aspect
    var f = 0
    while (f < frames) {
      o.write(0x2c) // image separator
      le16(o, 0); le16(o, 0); le16(o, 1); le16(o, 1) // left, top, 1x1
      o.write(0) // packed: no local color table
      o.write(2) // LZW minimum code size
      o.write(1); o.write(0x4c) // one 1-byte data sub-block
      o.write(0) // block terminator
      f += 1
    }
    o.write(0x3b) // trailer
    o.toByteArray
  }

  /** WAV: RIFF/WAVE + `fmt ` (PCM, real rate/channels/bits) + `data` chunk
    * declaring `dataBytes` with a truncated (absent) body.
    */
  def wav(sampleRate: Int, channels: Int, bitsPerSample: Int, dataBytes: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream(44)
    o.write(asciiBytes("RIFF")); le32(o, 36L + dataBytes); o.write(asciiBytes("WAVE"))
    o.write(asciiBytes("fmt ")); le32(o, 16L)
    le16(o, 1) // PCM
    le16(o, channels)
    le32(o, sampleRate.toLong)
    le32(o, sampleRate.toLong * channels * bitsPerSample / 8) // byte rate
    le16(o, channels * bitsPerSample / 8) // block align
    le16(o, bitsPerSample)
    o.write(asciiBytes("data")); le32(o, dataBytes)
    o.toByteArray
  }
}
