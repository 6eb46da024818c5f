package graft.operators

/** Test-only failure injection for multi-step store writers: named
  * points between a writer's commits where a spec can install a
  * throwing hook to simulate a crash (`StoreLifecycleSpec`). Production
  * behavior is a no-op — the hook costs one volatile read per named
  * point, all of which sit next to multi-second write jobs. */
private[graft] object Failpoints {
  @volatile private[graft] var hook: String => Unit = _ => ()
  private[graft] def hit(name: String): Unit = hook(name)

  /** Run `f` with `h` installed, always restoring the no-op. */
  private[graft] def withHook[T](h: String => Unit)(f: => T): T = {
    hook = h
    try f finally hook = _ => ()
  }
}
