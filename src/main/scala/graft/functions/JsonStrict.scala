package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side helpers for the strict-typed JSON probe expressions.
  * One Jackson parse per call; type checks mirror the reference's
  * Python-type-strict jsonget semantics (evtstrd/filters.py:32-53):
  * an int probe only accepts a JSON integral number (not bool, float,
  * or numeric string), a string probe only a JSON string.
  */
object JsonStrict {
  private val mapper = new ObjectMapper()

  private def descend(json: UTF8String, path: Array[String]): JsonNode = {
    if (json == null) return null
    val root =
      try mapper.readTree(json.toString)
      catch { case _: Exception => null }
    var n = root
    var i = 0
    while (n != null && i < path.length) {
      n = if (n.isObject) n.get(path(i)) else null
      i += 1
    }
    n
  }

  /** JSON integral number at path, else null. Integers wider than
    * int64 are rejected (longValue() would silently truncate them
    * into false matches).
    */
  def getLong(json: UTF8String, path: Array[String]): java.lang.Long = {
    val n = descend(json, path)
    if (n != null && n.isIntegralNumber && !n.isBoolean && n.canConvertToLong)
      java.lang.Long.valueOf(n.longValue())
    else null
  }

  /** JSON string at path, else null. */
  def getString(json: UTF8String, path: Array[String]): UTF8String = {
    val n = descend(json, path)
    if (n != null && n.isTextual) UTF8String.fromString(n.textValue())
    else null
  }
}
