package graft.functions

/** md5-derived hash primitives shared by the sketch operators (MinHash,
  * SimHash, rolling-hash fingerprints).
  *
  * Why md5 and not murmur3: both engines of the correctness gate have
  * md5 (`md5()` in Spark AND DuckDB), so every signature, band key, and
  * candidate set built from these values is recomputable in portable SQL
  * — the r15 verdict's oracle-promotion item. The JVM kernels here are
  * bit-identical to the SQL spellings pinned in their scaladoc, which is
  * what turns the whole sketch pipeline from rows-only/replica-tier into
  * fully hash-checked keys. (Murmur3 was the r1-r15 choice purely for
  * engine-internal determinism; nothing downstream depended on its
  * specific values.) At 100 TB md5-per-TOKEN/SHINGLE is the cost model —
  * the permutation fan-out stays cheap integer arithmetic, so MinHash
  * does ONE digest per shingle where the murmur3 form did numPerms
  * passes over the bytes.
  */
object OracleHash {

  /** 2^31-1 (Mersenne prime) — the modulus of the permutation family and
    * the rolling hash. Small enough that (a·h+b) stays inside a signed
    * 64-bit product, big enough that min-hash collisions are noise.
    */
  val P: Long = 2147483647L

  /** Polynomial rolling-hash base (prime, < 2^31). */
  val RollB: Long = 1000003L

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Raw 16-byte md5 digest (thread-local MessageDigest, zero per-call
    * allocation beyond the result array) — the shared kernel under
    * md5Int60/md5Long and the [[Md5PrefixLong]] expression.
    */
  def md5Digest(bytes: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(bytes)
  }

  /** First 60 bits of md5(bytes) as a non-negative Long — exactly DuckDB's
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)` and Spark SQL's
    * `conv(substring(md5(s), 1, 15), 16, 10)`: the first 15 hex chars are
    * the top 60 bits of the first 8 digest bytes big-endian.
    */
  def md5Int60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def md5Int60(s: String): Long =
    md5Int60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** md5Int60 reduced mod P — the MinHash base hash / rolling-hash token
    * value. SQL: `... % 2147483647`.
    */
  def md5ModP(bytes: Array[Byte]): Long = md5Int60(bytes) % P
  def md5ModP(s: String): Long = md5Int60(s) % P

  /** Full first 8 digest bytes big-endian as a SIGNED 64-bit value — the
    * SimHash per-token hash. SQL reconstructs its bits from two 32-bit
    * halves (chars 1-8 = bits 63..32, chars 9-16 = bits 31..0), each a
    * `CAST(('0x' || substr(md5(s), …, 8)) AS BIGINT)`.
    */
  def md5Long(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** MinHash permutation coefficients for permutation `i`: the affine
    * family h_i(x) = (a_i·x + b_i) mod P with deterministic,
    * SQL-expressible coefficients —
    *   a_i = ((i·1103515245 + 12345) mod (P-1)) + 1   (in [1, P-1])
    *   b_i = (i·69069 + 7) mod P
    * Products stay < 2^62, so both engines evaluate in exact signed
    * 64-bit arithmetic.
    */
  def permA(i: Int): Long = ((i.toLong * 1103515245L + 12345L) % (P - 1L)) + 1L
  def permB(i: Int): Long = (i.toLong * 69069L + 7L) % P
}
