package graft.sketches

/**
 * LEB128 unsigned varints for the COMPACT aggregation-buffer encodings of
 * the companion sketches (the packed-histogram move applied to the
 * partial buffers crossing the shuffle: a group that saw 3 distinct items
 * ships ~10 bytes, not a dense 2^p register array). The STORED wire
 * formats (`toBytes`) stay dense; each sketch's `fromBytes` dispatches on
 * a marker byte, so both forms decode to identical state.
 */
private[sketches] object Varint {

  def write(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class Reader(val bytes: Array[Byte], var pos: Int) {
    def read(): Long = {
      var shift = 0
      var acc = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        acc |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      acc
    }
    def readByte(): Byte = {
      val b = bytes(pos)
      pos += 1
      b
    }
  }
}
