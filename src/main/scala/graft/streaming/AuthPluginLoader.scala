package graft.streaming

/** Drop-in auth plugin loading — the Scala analog of the reference's
  * module-import plugin discovery (evtstrd/plugins/__init__.py:7-14,
  * plugins/README.md:12-36): the reference activates auth when a
  * module named `auth` is dropped into its plugins package; here a
  * config key (`AuthPlugin = fully.qualified.ClassName`) names the
  * drop-in class on the classpath. Key absent => allow-all (nothing
  * dropped in). A named-but-unloadable plugin fails loudly (the
  * PluginError analog, evtstrd/exc.py) — silently allowing all
  * traffic on a typo'd class name would invert the operator's intent.
  *
  * A plugin is any zero-arg-constructible class (or Scala `object`,
  * named with its trailing `$`) implementing
  * [[SseServer.AuthPlugin]] — the same contract the reference's
  * `check_auth` documents: route + lower-cased headers + subsystem
  * in, ok / ok-expiring / unauthorized(WWW-Authenticate) / forbidden
  * out (plugins/README.md:12-36).
  */
object AuthPluginLoader {
  final class PluginException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  def load(className: String): SseServer.AuthPlugin = {
    val inst =
      try {
        val cls = Class.forName(className)
        if (className.endsWith("$")) cls.getField("MODULE$").get(null)
        else cls.getDeclaredConstructor().newInstance()
      } catch {
        case e: ClassNotFoundException =>
          throw new PluginException(s"auth plugin '$className' not found", e)
        case e: ReflectiveOperationException =>
          throw new PluginException(
            s"auth plugin '$className' could not be instantiated", e)
      }
    inst match {
      case p: SseServer.AuthPlugin => p
      case _ =>
        throw new PluginException(
          s"auth plugin '$className' does not implement " +
            classOf[SseServer.AuthPlugin].getName)
    }
  }
}
