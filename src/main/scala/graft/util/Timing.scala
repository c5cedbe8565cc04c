package graft.util

/** Stage timing helpers (reference utility/utility.py:18-21). */
object Timing {

  /** "2 hr 3 min 4 sec"-style formatting of a duration in seconds,
    * matching the reference's format_time output shape. */
  def formatTime(seconds: Double): String = {
    val total = seconds.toLong
    val h = total / 3600
    val m = (total % 3600) / 60
    val s = total % 60
    if (h > 0) s"$h hr $m min $s sec"
    else if (m > 0) s"$m min $s sec"
    else f"$seconds%.2f sec"
  }

  /** Run `body`, returning (result, elapsedSeconds). */
  def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
