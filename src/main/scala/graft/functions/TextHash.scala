package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel.
  *
  * Semantics (kept bit-compatible with the DuckDB oracle SQL in
  * operators/Dedup.scala): tokens = text split on single spaces (empty
  * tokens preserved); shingles = adjacent token 2-grams, or [text] when
  * fewer than 2 tokens; per shingle two md5 hex digests of "0:"+s and
  * "1:"+s; signature slot k∈[0,4) = min over shingles of hex0[8k, 8k+8),
  * slots [4,8) likewise from hex1. Hex is lowercase, so byte order =
  * lexicographic string order.
  *
  * Composing this from built-ins needs `transform`/`aggregate`
  * higher-order functions, which Spark evaluates interpreted (no
  * whole-stage codegen) and which allocate an intermediate array per
  * pass — 18 passes for 8 slots. This native expression is one compiled
  * loop: no intermediate arrays, md5 via a thread-local MessageDigest. */
object TextHash {

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray
  private val P0 = "0:".getBytes(StandardCharsets.US_ASCII)
  private val P1 = "1:".getBytes(StandardCharsets.US_ASCII)

  private def md5Hex(prefix: Array[Byte], s: Array[Byte], from: Int, len: Int): Array[Char] = {
    val md = digest.get()
    md.reset()
    md.update(prefix)
    md.update(s, from, len)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HEX((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** Update mins(base..base+3) with the 4 slices of one 32-hex digest. */
  private def updateMins(mins: Array[String], base: Int, hex: Array[Char]): Unit = {
    var k = 0
    while (k < 4) {
      val sub = new String(hex, k * 8, 8)
      if (mins(base + k) == null || sub.compareTo(mins(base + k)) < 0) mins(base + k) = sub
      k += 1
    }
  }

  /** The kernel: text → 8-element signature array. */
  def minhash8(text: UTF8String): ArrayData = {
    if (text == null) return null
    val bytes = text.getBytes
    val mins = new Array[String](8)

    def addShingle(from: Int, len: Int): Unit = {
      updateMins(mins, 0, md5Hex(P0, bytes, from, len))
      updateMins(mins, 4, md5Hex(P1, bytes, from, len))
    }

    // single-space tokenization over UTF-8 bytes (0x20 never appears in a
    // multi-byte UTF-8 sequence, so byte scanning is codepoint-safe). A
    // 2-gram shingle w[i] + " " + w[i+1] is exactly the contiguous byte
    // span from the start of token i to the end of token i+1, because
    // tokens are separated by single spaces — no concatenation needed.
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    if (spaces == 0) addShingle(0, bytes.length) // < 2 tokens → [text]
    else {
      var prevStart = 0 // start of token idx-1
      var curStart = 0 // start of token idx
      var idx = 0
      var j = 0
      while (j <= bytes.length) {
        if (j == bytes.length || bytes(j) == ' '.toByte) { // token idx ends at j
          if (idx >= 1) addShingle(prevStart, j - prevStart)
          prevStart = curStart
          curStart = j + 1
          idx += 1
        }
        j += 1
      }
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }
}

/** `minhash8(text)` as a native expression: codegen emits one static
  * call; the whole signature stage stays in whole-stage codegen. */
case class MinHash8(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash8 expects STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhash8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash8"
}
