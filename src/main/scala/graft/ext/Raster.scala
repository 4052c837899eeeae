package graft.ext

/** Shared scan statistics over the raster codecs' common logical shape —
  * top-down row-major RGB bytes. [[Ppm]]/[[Bmp]]/[[Gif]]/[[Png]] each
  * decode into this layout (their `Image` case classes are per-codec for
  * type safety at the decode seam), so the unsigned-byte channel scans
  * live ONCE here instead of once per codec: a fix to the accumulation
  * (overflow, rounding) reaches every format. */
private[ext] object Raster {

  /** Per-channel means over `px` (unsigned bytes, RGB triplets). */
  def channelMeans(px: Array[Byte]): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < px.length) {
      r += px(i) & 0xff; g += px(i + 1) & 0xff; b += px(i + 2) & 0xff
      i += 3
    }
    val n = (px.length / 3).toDouble
    (r / n, g / n, b / n)
  }

  /** Mean of one channel (0 = R, 1 = G, 2 = B) over the TOP `rows` rows —
    * the row-order/placement witness statistic: whole-image means are
    * row-order-invariant, so this is what breaks when a flip, a
    * deinterlace, or a pass placement is wrong. */
  def topRowsChannelMean(px: Array[Byte], width: Int, rows: Int, channel: Int): Double = {
    require(rows > 0, "image too short for a top-half statistic")
    var sum = 0L
    var y = 0
    while (y < rows) {
      var i = (y * width) * 3 + channel
      val end = ((y + 1) * width) * 3
      while (i < end) { sum += px(i) & 0xff; i += 3 }
      y += 1
    }
    sum.toDouble / (rows.toLong * width)
  }
}
