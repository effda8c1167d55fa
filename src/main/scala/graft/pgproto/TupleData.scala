package graft.pgproto

/** A pgoutput tuple (row image) — column values tagged by kind.
  *
  * Wire layout (PostgreSQL docs, "Protocol Message Formats" → TupleData):
  * int16 column count, then per column a 1-byte tag:
  *   'n' null | 'u' unchanged TOAST | 't' text value | 'b' binary value,
  * where 't'/'b' are followed by int32 length + bytes.
  *
  * The reference models this as `tuple.Data` (`pq/message/tuple/data.go:19-37`)
  * and decodes only 'n'/'t' (values always arrive text-format because it never
  * requests binary; `data.go:82-90,99`). We keep the raw bytes here; value
  * typing happens in the graft.types bridge.
  */
object TupleData {
  final val TagNull: Byte = 'n'
  final val TagToast: Byte = 'u' // unchanged TOASTed value, not sent
  final val TagText: Byte = 't'
  final val TagBinary: Byte = 'b'

  /** One column of a tuple. `data` is null for 'n'/'u'. */
  final case class Col(tag: Byte, data: Array[Byte]) {
    def isNull: Boolean = tag == TagNull
    def isToast: Boolean = tag == TagToast
    /** Text-format value (pgoutput sends text unless binary requested). */
    def text: String =
      if (data == null) null
      else new String(data, java.nio.charset.StandardCharsets.UTF_8)
  }

  final case class Tuple(cols: Array[Col])

  def read(r: ByteReader): Tuple = {
    val n = r.readUint16("tuple column count")
    val cols = new Array[Col](n)
    var i = 0
    while (i < n) {
      val tag = r.readByte("tuple column tag")
      cols(i) = tag match {
        case TagNull | TagToast => Col(tag, null)
        case TagText | TagBinary =>
          val len = r.readUint32("tuple column length").toInt
          Col(tag, r.readBytes(len, "tuple column data"))
        case other =>
          throw new PgProtoException(f"unknown tuple column tag 0x$other%02x")
      }
      i += 1
    }
    Tuple(cols)
  }

  /** TOAST restoration: where the new tuple carries 'u' (unchanged TOAST),
    * substitute the old tuple's column before decoding. Requires REPLICA
    * IDENTITY FULL to have an old image — same limitation as the reference
    * (`pq/message/format/update.go:100-108`, README.md:215-231).
    */
  def mergeToast(newTuple: Tuple, oldTuple: Tuple): Tuple = {
    if (oldTuple == null) return newTuple
    val merged = new Array[Col](newTuple.cols.length)
    var i = 0
    while (i < newTuple.cols.length) {
      val c = newTuple.cols(i)
      merged(i) = if (c.isToast && i < oldTuple.cols.length) oldTuple.cols(i) else c
      i += 1
    }
    Tuple(merged)
  }
}
