package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 56-bit md5 hash of a string as ONE digest pass.
  *
  * Value-identical to `conv(substring(md5(c), 1, 14), 16, 10)` — the first
  * 14 hex digits of the md5 are exactly the first 7 digest bytes read
  * big-endian — but without materializing the 32-char hex string or
  * re-parsing it base-16. On the shingle/token hot paths (hundreds of
  * thousands of hashes per partition in the near-dup operators) that
  * removes two string allocations per value while keeping the whole stage
  * codegen'd. Engine-portable like the expression it replaces: the DuckDB
  * oracle computes the identical integer from md5 hex arithmetic.
  */
case class Md5Hash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash56"
  // deterministic pure function: let ConstantFolding collapse literal input
  override def foldable: Boolean = child.foldable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string or binary input, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String  => Md5Hash56.hash(s)
    case b: Array[Byte] => Md5Hash56.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash56.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash56 =
    copy(child = newChild)
}

object Md5Hash56 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 7 md5 bytes big-endian = first 14 hex digits as a base-16 long. */
  def hash(s: UTF8String): Long = hash(s.getBytes)

  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }

  // one reused digest-output buffer per thread: MessageDigest.digest()
  // allocates a fresh 16-byte array per call, which the slice-hashing
  // hot paths (WinnowFingerprints: one hash per k-gram per document)
  // pay millions of times per partition
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Hash a SLICE of `bytes` without materializing the slice — the
    * zero-allocation form for callers that hash many substrings of one
    * buffer (value-identical to `hash(bytes.slice(off, off+len))`). */
  def hash(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(bytes, off, len)
    val d = outBuf.get()
    md.digest(d, 0, 16)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }
}
