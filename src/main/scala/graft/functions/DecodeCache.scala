package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods

/** Per-thread decode cache for broadcast codebook columns.
  *
  * The ANN kernels ([[IvfUtil]], [[PqUtil]]) receive the same broadcast
  * codebook as an `ArrayData` on EVERY input row; walking it through the
  * generic accessors costs several wrapper allocations per (row, entry)
  * — measured as 76.6 s of the 92 s x100 IVF assignment before this
  * cache existed (BASELINE.md round 11). Decoding once per thread and
  * scoring over primitive arrays removes all of it.
  *
  * A cache hit requires FULL byte equality against a private copy of
  * the previously decoded buffer (one word-wise memcmp per row — the
  * same memory traffic as the scoring pass it guards). Identity or
  * (base, offset, size) keying would be unsound: a task-reused
  * UnsafeRow buffer refilled with a DIFFERENT codebook presents the
  * same object and address with new bytes, and must decode fresh —
  * OpsSpec pins exactly that refill pattern. Non-Unsafe `ArrayData`
  * (interpreted corners) decodes per call, which is merely the old
  * cost. Alternating codebooks on one thread degrade to decode-per-row
  * (a miss memcmps then decodes), never to a wrong answer.
  */
private[functions] final class DecodeCache[T <: AnyRef](decodeFn: ArrayData => T) {
  private final class Entry(val bytes: Array[Byte], val value: T)
  private val cached = new ThreadLocal[Entry]

  def get(cb: ArrayData): T = cb match {
    case u: UnsafeArrayData =>
      val size = u.getSizeInBytes
      val c = cached.get()
      if (c != null && c.bytes.length == size &&
          ByteArrayMethods.arrayEquals(
            c.bytes, Platform.BYTE_ARRAY_OFFSET,
            u.getBaseObject, u.getBaseOffset, size.toLong)) c.value
      else {
        val bytes = new Array[Byte](size)
        Platform.copyMemory(u.getBaseObject, u.getBaseOffset,
          bytes, Platform.BYTE_ARRAY_OFFSET, size.toLong)
        val v = decodeFn(u)
        cached.set(new Entry(bytes, v))
        v
      }
    case other => decodeFn(other)
  }
}
