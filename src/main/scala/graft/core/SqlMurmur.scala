package graft.core

/** DuckDB-SQL emission of Spark's Murmur3 `hash()` (seed 42).
  *
  * The EP2 pipeline derives its synthetic sky positions with
  * `pmod(hash(key [, lit]), m)` (Pipeline.scala — Murmur3 avalanche
  * mixing, not an LCG; see the geometry note there). Oracling the
  * pipeline end-to-end therefore needs DuckDB to reproduce those
  * positions bit-exactly, so this emits the 32-bit Murmur3 rounds
  * (org.apache.spark.unsafe.hash.Murmur3_x86_32: hashLong for BIGINT
  * columns, hashInt for chained int literals) as SQL.
  *
  * Arithmetic model: unsigned 32-bit values carried in non-negative
  * BIGINTs. DuckDB has no wrap-around 32-bit multiply (BIGINT
  * overflow raises), so `mul32` splits the multiplicand into 16-bit
  * halves — every partial product stays below 2^49, exact in BIGINT —
  * and reduces mod 2^32. Rotations/shifts become div/mod by powers of
  * two; `xor()` works on BIGINT directly.
  *
  * Domain: non-negative keys < 2^31 (all testdata keys), so the
  * long's low word equals the key and its high word is 0 — the second
  * hashLong block mixes a constant 0 (mixK1(0) = 0, and x^0 = x).
  *
  * Emission: one nested subquery per mixing step, each adding ONE
  * column referencing the previous layer's column. NOT lateral column
  * aliases — DuckDB resolves those by textual inlining, and since
  * every mul32/rotl references its input twice, inlining grows the
  * expression tree exponentially in the number of rounds (measured:
  * unplannable at ~45 steps; the nested form runs 100k keys in
  * ~0.1 s).
  *
  * Cross-checked against Spark's hash() over a 100k-key range by
  * graft.tools.HashOracleDump + tools/hash_oracle_check.py.
  */
object SqlMurmur {
  private val M32 = 4294967296L // 2^32

  private def u(i: Int): Long = i.toLong & 0xFFFFFFFFL

  /** (a * c) mod 2^32 for unsigned-32 `a` (expr) and constant c. */
  private def mul32(a: String, c: Long): String =
    s"(((($a) // 65536) * $c % 65536) * 65536 + (($a) % 65536) * $c) % $M32"

  /** 32-bit rotate-left by r for unsigned-32 `a`. */
  private def rotl(a: String, r: Int): String = {
    val lo = 1L << (32 - r)
    s"((($a) % $lo) * ${1L << r} + ($a) // $lo)"
  }

  /** Murmur3 mixK1 of a compile-time int (for chained literal
    * columns: Spark hashes each column with the running hash as
    * seed). */
  private def mixK1Const(k: Int): Long = {
    var k1 = k * 0xcc9e2d51
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= 0x1b873593
    u(k1)
  }

  /** Wraps `base` (a SELECT projecting at least `keep` and the key)
    * in one nested projection per Murmur3 step, ending in
    * `SELECT keep..., <pmod result> AS alias`. The result column is
    * BIGINT in [0, m) and equals Spark's
    * `pmod(hash(keyExpr [, extraIntLits...]), m)`. */
  def withPmodHash(base: String, keyExpr: String, extraIntLits: Seq[Int],
                   m: Long, alias: String, keep: Seq[String]): String = {
    val steps = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var n = 0
    def step(expr: String): String = {
      val a = s"${alias}_$n"; n += 1
      steps += ((a, expr))
      a
    }
    def mixH1(h: String, kExpr: String): String = {
      val x = step(s"xor($h, $kExpr)")
      val r = step(rotl(x, 13))
      step(s"(${mul32(r, 5L)} + ${u(0xe6546b64)}) % $M32")
    }
    def mixH1ZeroK(h: String): String = { // k = 0: the xor is identity
      val r = step(rotl(h, 13))
      step(s"(${mul32(r, 5L)} + ${u(0xe6546b64)}) % $M32")
    }
    def fmix(h: String, len: Int): String = {
      val a = step(s"xor($h, $len)")
      val b = step(s"xor($a, ($a) // 65536)")
      val c = step(mul32(b, u(0x85ebca6b)))
      val d = step(s"xor($c, ($c) // 8192)")
      val e = step(mul32(d, u(0xc2b2ae35)))
      step(s"xor($e, ($e) // 65536)")
    }
    def mixK1(x: String): String = {
      val a = step(mul32(x, u(0xcc9e2d51)))
      val b = step(rotl(a, 15))
      step(mul32(b, 0x1b873593L))
    }
    // hashLong(key, 42): low word = key, high word = 0
    var h = mixH1("42", mixK1(s"($keyExpr)"))
    h = mixH1ZeroK(h)
    h = fmix(h, 8)
    // each extra int literal: hashInt(lit, seed = running hash)
    extraIntLits.foreach { c =>
      h = mixH1(h, mixK1Const(c).toString)
      h = fmix(h, 4)
    }
    val signed = step(s"CASE WHEN ($h) >= 2147483648 THEN ($h) - $M32 ELSE ($h) END")
    var q = base
    steps.foreach { case (a, ex) => q = s"SELECT *, $ex AS $a FROM ($q)" }
    s"SELECT ${keep.mkString(", ")}, ((($signed) % $m) + $m) % $m AS $alias FROM ($q)"
  }
}
