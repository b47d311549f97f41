package graft.streaming

/** Test-only bridge into `private[streaming]` state: lets a spec
  * simulate an in-flight compaction deterministically (register a
  * compact token as live, probe the busy path, unregister) without
  * racing a real long-running compact on a second thread.
  */
object StreamingTestHooks {
  def registerCompact(token: String): Unit = HtaStore.registerCompact(token)
  def unregisterCompact(token: String): Unit = HtaStore.unregisterCompact(token)
  def compactIsActive(token: String): Boolean = HtaStore.compactIsActive(token)
}
