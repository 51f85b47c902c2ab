package graft.core

/**
 * Debug/reporting dumps of a histogram's non-empty bins, format-compatible
 * with the reference demo printer (dynahist `test/.../demo/PrintUtil.java`):
 * `%24.17E - %24.17E : %19d\n` per bin (Locale.ROOT), bounds clamped to
 * [min,max]. `prettyPrint` draws cumulative star bars (one star per count,
 * accumulated across bins — matching the reference output byte-for-byte).
 */
object PrintUtil {

  def print(h: Histogram): String = {
    require(h.totalCount != 0, "histogram must be non-empty")
    val sb = new StringBuilder
    val it = h.firstNonEmptyBin
    sb.append(
      String.format(
        java.util.Locale.ROOT,
        "%24.17E - %24.17E : %19d\n",
        java.lang.Double.valueOf(it.lowerBound),
        java.lang.Double.valueOf(it.upperBound),
        java.lang.Long.valueOf(it.binCount)))
    while (!it.isLastNonEmptyBin) {
      it.next()
      sb.append(
        String.format(
          java.util.Locale.ROOT,
          "%24.17E - %24.17E : %19d\n",
          java.lang.Double.valueOf(it.lowerBound),
          java.lang.Double.valueOf(it.upperBound),
          java.lang.Long.valueOf(it.binCount)))
    }
    sb.toString
  }

  def prettyPrint(h: Histogram): String = {
    require(h.totalCount != 0, "histogram must be non-empty")
    val sb = new StringBuilder
    val stars = new StringBuilder
    val it = h.firstNonEmptyBin
    var i = 0L
    while (i < it.binCount) { stars.append('*'); i += 1 }
    sb.append(
      String.format(
        java.util.Locale.ROOT,
        "%24.17E - %24.17E : %s\n",
        java.lang.Double.valueOf(it.lowerBound),
        java.lang.Double.valueOf(it.upperBound),
        stars))
    while (!it.isLastNonEmptyBin) {
      it.next()
      var j = 0L
      while (j < it.binCount) { stars.append('*'); j += 1 }
      sb.append(
        String.format(
          java.util.Locale.ROOT,
          "%24.17E - %24.17E : %s\n",
          java.lang.Double.valueOf(it.lowerBound),
          java.lang.Double.valueOf(it.upperBound),
          stars))
    }
    sb.toString
  }
}
