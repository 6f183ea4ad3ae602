package graft.sources

/** TEST-ONLY fault injection for the object-store maintenance
  * orderings (round 7 — the r6 verdict's crash-injection ask): the
  * fold/commit step boundaries are argued crash-safe in comments;
  * CrashInjectionSpec arms this hook to THROW at a named point,
  * simulating a crash inside the window, and then asserts the
  * invariants the comments claim (no resurrection, no loss, reader
  * consistency, recovery to a clean state).
  *
  * Production never arms it: the default hook is a no-op and every
  * `hit` is a single volatile read + static call.
  */
object FaultPoints {
  /** Exception type the spec's armed hooks throw. */
  final class InjectedCrash(val point: String)
    extends RuntimeException(s"injected crash at $point")

  @volatile private[graft] var hook: String => Unit = _ => ()

  def hit(point: String): Unit = hook(point)

  /** Arm: throw at the first occurrence of `point`, then disarm (so
    * recovery re-runs don't re-crash). */
  private[graft] def crashAt(point: String): Unit = {
    hook = p => if (p == point) { hook = _ => (); throw new InjectedCrash(p) }
  }

  private[graft] def disarm(): Unit = hook = _ => ()
}
