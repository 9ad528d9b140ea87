package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's partitioning hash (`hashFunc`,
  * `mpi_mapreduce.c:108-117`):
  *
  * {{{ hash = 0; for each byte b: hash = ((hash << 4) ^ hash) ^ b; hash & 255 }}}
  *
  * in C signed-int32 two's-complement arithmetic. Java `Int` shift/xor
  * have identical wrap semantics, so a fold over the character codes
  * reproduces it bit-for-bit (for ASCII input; bytes ≥ 0x80 would need
  * the C signed-char sign-extension, which this corpus never hits).
  *
  * The hash choice is semantics-invisible to the aggregate (SURVEY §2.4
  * — any total partitioning of keys yields identical counts); it exists
  * so the reference's bucket layout itself can be oracle-checked.
  */
object RefHash {

  /** Column form: expressed with higher-order built-ins (no UDF — keeps
    * the expression serializable and Catalyst-optimizable).
    */
  def ref_hash(word: Column): Column =
    aggregate(
      filter(split(word, ""), c => c =!= ""),
      lit(0),
      (h, c) => shiftleft(h, 4).bitwiseXOR(h).bitwiseXOR(ascii(c)))
      .bitwiseAND(lit(255))

  /** JVM reference implementation (test oracle). */
  def refHashExact(word: String): Int = {
    var hash = 0
    var i = 0
    while (i < word.length) {
      hash = ((hash << 4) ^ hash) ^ word.charAt(i).toInt
      i += 1
    }
    hash & 255
  }
}
