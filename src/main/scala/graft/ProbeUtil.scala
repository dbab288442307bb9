package graft

/** Shared helpers for the committed scale-probe mains (ProbeDedup,
  * ProbeSearch, ProbeIvf, ProbeWb, ProbeSkew): one timing format so probe
  * output stays grep-able across tools. */
object ProbeUtil {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
}
