package graft

/** Per-SF scratch roots under `java.io.tmpdir` for staged layouts and
  * streaming stage/checkpoint/sink dirs.
  *
  * These dirs used to be FIXED shared paths whose staging starts with
  * a recursive delete — two concurrent sessions (or parallel test
  * forks) running the same query against different SFs would corrupt
  * each other's stage/checkpoint/sink mid-run (ADVICE r9). Every
  * scratch root is now suffixed with a token derived from the
  * absolute sfDir, matching how per-SF isolation is handled
  * elsewhere: re-runs against the SAME sf reuse/replace the same
  * layout (idempotent staging stays part of the declared contract,
  * e.g. q172's second-run fragment census), while runs against
  * different SFs never collide. Two sessions on the same (name,
  * sfDir) remain a documented single-writer constraint — the bench
  * and verify drivers are strictly serial per SF.
  */
object Scratch {

  /** `tmpdir/graft_<name>_<sf-token>`; stable across JVMs for the
    * same sfDir (MurmurHash3 over the absolute path — NOT
    * String.hashCode, whose value is JVM-spec-pinned too, but murmur
    * keeps tokens well-mixed for nearby paths). */
  def dir(name: String, sfDir: String): String = {
    val token = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        new java.io.File(sfDir).getAbsolutePath))
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_${name}_$token")
      .getAbsolutePath
  }
}
