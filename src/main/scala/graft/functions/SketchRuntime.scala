package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Static runtime bodies for the sketch expressions. Kept in a
  * top-level object so generated Java can call the static forwarders
  * directly (`SketchRuntime.minhashSig(...)`) — the standard way to
  * codegen a non-trivial kernel without inlining its loop.
  */
object SketchRuntime {

  def minhashSig(arr: ArrayData, numPerm: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = Sketch.contentHash(arr.getUTF8String(i))
      var p = 0
      while (p < numPerm) {
        val hp = Sketch.permA(p) * h + Sketch.permB(p)
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Sketch.contentHash(arr.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def hyperplaneBucket(arr: ArrayData, planes: Int, seed: Int): Long = {
    val dim = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val w = (Sketch.mix64((seed.toLong * 524287L + p) * 8191L + d) & 1023L) / 1024.0 - 0.5
        proj += arr.getFloat(d) * w
        d += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
