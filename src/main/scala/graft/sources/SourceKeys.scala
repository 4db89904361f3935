package graft.sources

import org.apache.spark.unsafe.types.UTF8String

/** Driver-side identity tokens for memoized corpus layouts
  * ([[Bucketing.ensureBucketed]], [[Writers.ensurePartitioned]]).
  *
  * The token is the engine's md5-derived portable hash
  * ([[graft.functions.Md5]] window 0 + window 1 = 64 bits of digest),
  * NOT `String.hashCode`: a 32-bit hashCode collision between two corpus
  * dirs in one JVM would silently serve one corpus's layout for the
  * other (ADVICE r12). 64 digest bits put a same-process collision
  * beyond realistic corpus-dir counts.
  */
object SourceKeys {
  def dirToken(dir: String): String = {
    val s = UTF8String.fromString(dir)
    f"${graft.functions.Md5.hash32(s, 0)}%08x${graft.functions.Md5.hash32(s, 1)}%08x"
  }
}
