package fes

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, functions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed (zero-copy-buffer) twins of the fes.* UserDefinedAggregateFunction
 * sketches, via the PUBLIC Aggregator + functions.udaf API — Spark plans
 * these as TypedImperativeAggregate inside ObjectHashAggregate, so the
 * buffer lives as ONE mutable JVM object across a partition's rows and is
 * serialized (kryo) only at the partial/final exchange boundary. The UDAF
 * forms copy their buffer arrays through the Row interface on EVERY row
 * (~15k rows/s/core at k=64 — PERF.md "zero-copy JVM aggregate buffers",
 * VERDICT r13 missing item 2); these remove that per-row copy with the
 * SAME algorithms, so all recorded results are bit-identical:
 *
 * - DyadicHistTI / DyadicHistWTI: the merge-order-INVARIANT adaptive
 *   dyadic histogram (DyadicHist.java proof) — state is a pure function
 *   of the input multiset, so swapping the implementation cannot change
 *   any result.
 * - KmvBottomKTI: bottom-k distinct hashes — also multiset-pure.
 * - MGTopKTI: the Misra-Gries summary content is merge-order-dependent
 *   (MGTopK.java contract), but every caller reads it through the
 *   certified-read guarantee (exact-heavy semi-join survivors), which
 *   holds for every valid summary — results unchanged.
 *
 * Compiled by the Scala compiler BUNDLED IN THE PYSPARK JARS
 * (scala-compiler-2.13, invoked as `java -cp <jars> scala.tools.nsc.Main`
 * — no external toolchain), and registered into a RUNNING session (vanilla
 * included) through ScalaReg below, loaded via the session's ADD JAR
 * classloader.
 */

// ------------------------------------------------------------------ dyadic

/** Mutable buffer: level + ascending (bucket, count) arrays, first n live.
  * Capacity never needs to exceed insert-overshoot (k+1) or merge-overshoot
  * (2k+2); compress() restores n <= k. */
class DyadicBuf(
    var level: Int,
    var bs: Array[Long],
    var cs: Array[Long],
    var n: Int
) extends Serializable

object DyadicOps {
  /** Coarsen in place by `shift` levels (adjacent buckets merge; ascending
    * order is preserved because >> is monotone). */
  def coarsen(b: DyadicBuf, shift: Int): Unit = {
    if (shift <= 0) { return }
    if (b.n > 0) {
      var w = 0
      var i = 0
      while (i < b.n) {
        val nb = b.bs(i) >> shift
        if (w > 0 && b.bs(w - 1) == nb) { b.cs(w - 1) += b.cs(i) }
        else { b.bs(w) = nb; b.cs(w) = b.cs(i); w += 1 }
        i += 1
      }
      b.n = w
    }
    b.level += shift
  }

  def compress(b: DyadicBuf, k: Int): Unit = {
    while (b.n > k) coarsen(b, 1)
  }

  def addOne(b: DyadicBuf, k: Int, v: Long, c: Long): Unit = {
    if (v < 0) {
      throw new IllegalArgumentException(
        "DyadicHist: negative input " + v + " (dyadic shift is floor " +
          "division only for v >= 0 — offset or filter first)")
    }
    val bk = v >> b.level
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.bs(mid) < bk) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && b.bs(lo) == bk) {
      b.cs(lo) += c
    } else {
      if (b.n + 1 > b.bs.length) {
        b.bs = java.util.Arrays.copyOf(b.bs, math.max(b.n + 1, k + 1))
        b.cs = java.util.Arrays.copyOf(b.cs, math.max(b.n + 1, k + 1))
      }
      System.arraycopy(b.bs, lo, b.bs, lo + 1, b.n - lo)
      System.arraycopy(b.cs, lo, b.cs, lo + 1, b.n - lo)
      b.bs(lo) = bk
      b.cs(lo) = c
      b.n += 1
      compress(b, k)
    }
  }

  def mergeInto(x: DyadicBuf, y: DyadicBuf, k: Int): DyadicBuf = {
    if (y.n == 0) { return x }
    if (x.n == 0) {
      x.level = y.level; x.bs = y.bs; x.cs = y.cs; x.n = y.n
      return x
    }
    val target = math.max(x.level, y.level)
    coarsen(x, target - x.level)
    coarsen(y, target - y.level)
    val cap = math.max(x.n + y.n, k + 1)
    val nb = new Array[Long](cap)
    val nc = new Array[Long](cap)
    var i = 0; var j = 0; var w = 0
    while (i < x.n || j < y.n) {
      if (j >= y.n || (i < x.n && x.bs(i) < y.bs(j))) {
        nb(w) = x.bs(i); nc(w) = x.cs(i); i += 1
      } else if (i >= x.n || y.bs(j) < x.bs(i)) {
        nb(w) = y.bs(j); nc(w) = y.cs(j); j += 1
      } else {
        nb(w) = x.bs(i); nc(w) = x.cs(i) + y.cs(j); i += 1; j += 1
      }
      w += 1
    }
    x.bs = nb; x.cs = nc; x.n = w; x.level = target
    compress(x, k)
    x
  }

  def finish(b: DyadicBuf): Array[Long] = {
    val out = new Array[Long](1 + 2 * b.n)
    out(0) = b.level.toLong
    var i = 0
    while (i < b.n) {
      out(1 + 2 * i) = b.bs(i)
      out(2 + 2 * i) = b.cs(i)
      i += 1
    }
    out
  }

  def zero(k: Int): DyadicBuf =
    new DyadicBuf(0, new Array[Long](k + 1), new Array[Long](k + 1), 0)
}

class DyadicHistTI(k: Int)
    extends Aggregator[java.lang.Long, DyadicBuf, Array[Long]] {
  def zero: DyadicBuf = DyadicOps.zero(k)
  def reduce(b: DyadicBuf, a: java.lang.Long): DyadicBuf = {
    if (a != null) DyadicOps.addOne(b, k, a.longValue(), 1L)
    b
  }
  def merge(x: DyadicBuf, y: DyadicBuf): DyadicBuf = DyadicOps.mergeInto(x, y, k)
  def finish(b: DyadicBuf): Array[Long] = DyadicOps.finish(b)
  def bufferEncoder: Encoder[DyadicBuf] = Encoders.kryo(classOf[DyadicBuf])
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Weighted feed: (value, count) pairs — a codegen pre-aggregation collapses
  * duplicates before this aggregate (DyadicHistW.java precedent); identical
  * state by merge-order invariance (a weighted multiset IS the multiset). */
class DyadicHistWTI(k: Int)
    extends Aggregator[(java.lang.Long, java.lang.Long), DyadicBuf, Array[Long]] {
  def zero: DyadicBuf = DyadicOps.zero(k)
  def reduce(b: DyadicBuf, a: (java.lang.Long, java.lang.Long)): DyadicBuf = {
    if (a != null && a._1 != null && a._2 != null) {
      DyadicOps.addOne(b, k, a._1.longValue(), a._2.longValue())
    }
    b
  }
  def merge(x: DyadicBuf, y: DyadicBuf): DyadicBuf = DyadicOps.mergeInto(x, y, k)
  def finish(b: DyadicBuf): Array[Long] = DyadicOps.finish(b)
  def bufferEncoder: Encoder[DyadicBuf] = Encoders.kryo(classOf[DyadicBuf])
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

// --------------------------------------------------------------------- kmv

class KmvBuf(var hs: Array[Long], var n: Int) extends Serializable

class KmvBottomKTI(k: Int)
    extends Aggregator[java.lang.Long, KmvBuf, Array[Long]] {
  def zero: KmvBuf = new KmvBuf(new Array[Long](k + 1), 0)

  private def insert(b: KmvBuf, h: Long): Unit = {
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && b.hs(lo) == h) { return } // distinct: already present
    if (b.n >= k && lo >= k) { return } // full and h > current max
    System.arraycopy(b.hs, lo, b.hs, lo + 1, math.min(b.n, k) - lo)
    b.hs(lo) = h
    if (b.n < k) b.n += 1
  }

  def reduce(b: KmvBuf, a: java.lang.Long): KmvBuf = {
    if (a != null) insert(b, a.longValue())
    b
  }
  def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    var j = 0
    while (j < y.n) { insert(x, y.hs(j)); j += 1 }
    x
  }
  def finish(b: KmvBuf): Array[Long] = java.util.Arrays.copyOf(b.hs, b.n)
  def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo(classOf[KmvBuf])
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

// ---------------------------------------------------------------------- mg

class MGBuf(var ks: Array[String], var cs: Array[Long], var n: Int)
    extends Serializable

class MGTopKTI(k: Int) extends Aggregator[String, MGBuf, Array[String]] {
  def zero: MGBuf = new MGBuf(new Array[String](k + 1), new Array[Long](k + 1), 0)

  private def cmpUtf8(a: String, b: String): Int = {
    val ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n) {
      val d = (ba(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) { return d }
      i += 1
    }
    ba.length - bb.length
  }

  private def addAndShrink(b: MGBuf, key: String, c: Long): Unit = {
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmpUtf8(b.ks(mid), key) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && cmpUtf8(b.ks(lo), key) == 0) {
      b.cs(lo) += c
      return
    }
    System.arraycopy(b.ks, lo, b.ks, lo + 1, b.n - lo)
    System.arraycopy(b.cs, lo, b.cs, lo + 1, b.n - lo)
    b.ks(lo) = key
    b.cs(lo) = c
    b.n += 1
    if (b.n > k) {
      // MG rule: subtract the (k+1)-st largest count, drop non-positive
      val sorted = java.util.Arrays.copyOf(b.cs, b.n)
      java.util.Arrays.sort(sorted)
      val d = sorted(b.n - 1 - k)
      var w = 0
      var i = 0
      while (i < b.n) {
        val nc = b.cs(i) - d
        if (nc > 0) { b.ks(w) = b.ks(i); b.cs(w) = nc; w += 1 }
        i += 1
      }
      var z = w
      while (z < b.n) { b.ks(z) = null; z += 1 }
      b.n = w
    }
  }

  def reduce(b: MGBuf, a: String): MGBuf = {
    if (a != null) addAndShrink(b, a, 1L)
    b
  }
  def merge(x: MGBuf, y: MGBuf): MGBuf = {
    var i = 0
    while (i < y.n) { addAndShrink(x, y.ks(i), y.cs(i)); i += 1 }
    x
  }
  def finish(b: MGBuf): Array[String] = {
    val out = new Array[String](b.n)
    var i = 0
    while (i < b.n) { out(i) = b.ks(i) + "\t" + b.cs(i); i += 1 }
    out
  }
  def bufferEncoder: Encoder[MGBuf] = Encoders.kryo(classOf[MGBuf])
  def outputEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
}

// -------------------------------------------------------------- kmv sample

class KmvSampleBuf(
    var hs: Array[Long],
    var ks: Array[String],
    var vs: Array[java.lang.Double],
    var n: Int
) extends Serializable

/** Typed twin of KmvSampleBottomK.java — bottom-k rows by (hash, key)
  * carrying a value payload; ordering and multiset semantics mirror the
  * Java form exactly (unsigned UTF-8 key ties, stable insert after all
  * entries <= (h, key), duplicates kept). */
class KmvSampleBottomKTI(k: Int)
    extends Aggregator[
      (java.lang.Long, String, java.lang.Double),
      KmvSampleBuf,
      Array[java.lang.Double]
    ] {
  def zero: KmvSampleBuf = new KmvSampleBuf(
    new Array[Long](k + 1),
    new Array[String](k + 1),
    new Array[java.lang.Double](k + 1),
    0
  )

  private def cmpUtf8(a: String, b: String): Int = {
    val ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n) {
      val d = (ba(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) { return d }
      i += 1
    }
    ba.length - bb.length
  }

  private def insert(
      b: KmvSampleBuf, h: Long, key: String, v: java.lang.Double): Unit = {
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val mh = b.hs(mid)
      val c = if (mh < h) -1 else if (mh > h) 1 else cmpUtf8(b.ks(mid), key)
      if (c <= 0) lo = mid + 1 else hi = mid
    }
    if (b.n >= k && lo >= k) { return } // full and past the cutoff
    val keep = math.min(b.n, k) - lo
    System.arraycopy(b.hs, lo, b.hs, lo + 1, keep)
    System.arraycopy(b.ks, lo, b.ks, lo + 1, keep)
    System.arraycopy(b.vs, lo, b.vs, lo + 1, keep)
    b.hs(lo) = h
    b.ks(lo) = key
    b.vs(lo) = v
    if (b.n < k) b.n += 1
  }

  def reduce(
      b: KmvSampleBuf,
      a: (java.lang.Long, String, java.lang.Double)): KmvSampleBuf = {
    if (a != null && a._1 != null && a._2 != null) {
      insert(b, a._1.longValue(), a._2, a._3)
    }
    b
  }
  def merge(x: KmvSampleBuf, y: KmvSampleBuf): KmvSampleBuf = {
    var i = 0
    while (i < y.n) { insert(x, y.hs(i), y.ks(i), y.vs(i)); i += 1 }
    x
  }
  def finish(b: KmvSampleBuf): Array[java.lang.Double] =
    java.util.Arrays.copyOf(b.vs, b.n)
  def bufferEncoder: Encoder[KmvSampleBuf] =
    Encoders.kryo(classOf[KmvSampleBuf])
  def outputEncoder: Encoder[Array[java.lang.Double]] =
    ExpressionEncoder[Array[java.lang.Double]]()
}

// --------------------------------------------------------------------- hll

/** Portable-HLL register array as ONE typed buffer: m = 2^p bytes of
  * max-rho state per group (vs the register RELATION's m rows x ~20
  * bytes per group per partition on the shuffle — sketch.py
  * hll_registers). Register-wise max is a commutative idempotent monoid
  * and rho is a pure function of the hash, so the state is a pure
  * function of the input SET — merge-order invariant, bit-identical to
  * the relation form, same oracle. Input is the engine-portable 32-bit
  * md5 hash (portable_hash32) as a long in [0, 2^32); rho arithmetic
  * mirrors hll_registers exactly (all-zero remainder pinned to
  * q = rem_bits + 1; otherwise rem_bits - floor(log2(rem))). */
class HllTI(p: Int) extends Aggregator[java.lang.Long, Array[Byte], Array[Long]] {
  private val m = 1 << p
  private val remBits = 32 - p
  private val div = 1L << remBits
  private val q = remBits + 1

  def zero: Array[Byte] = new Array[Byte](m)

  def reduce(b: Array[Byte], a: java.lang.Long): Array[Byte] = {
    if (a != null) {
      val h = a.longValue()
      if (h < 0 || h >= (1L << 32)) {
        throw new IllegalArgumentException(
          "HllTI: hash out of [0, 2^32): " + h +
            " (feed portable_hash32 output)")
      }
      val bucket = (h / div).toInt
      val rem = h % div
      val rho =
        if (rem == 0) q
        else remBits - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > b(bucket)) b(bucket) = rho.toByte
    }
    b
  }

  def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (y(i) > x(i)) x(i) = y(i)
      i += 1
    }
    x
  }

  /** Flat [bucket, max_rho, ...] pairs for NON-EMPTY registers, bucket
    * ascending — the same relation hll_registers emits (rho >= 1 for
    * every observed hash, so byte 0 == register never hit). */
  def finish(b: Array[Byte]): Array[Long] = {
    var n = 0
    var i = 0
    while (i < m) { if (b(i) != 0) n += 1; i += 1 }
    val out = new Array[Long](2 * n)
    var w = 0
    i = 0
    while (i < m) {
      if (b(i) != 0) {
        out(w) = i.toLong
        out(w + 1) = b(i).toLong
        w += 2
      }
      i += 1
    }
    out
  }

  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

// ---------------------------------------------------------------- count-min

/** Count-min counter matrix as ONE typed Array[Long] buffer (row-major
  * depth x width) — the typed form of sketch.py::cm_sketch. Counter
  * addition is a commutative monoid and the coordinates are a pure
  * function of the value (the engine-portable md5 bucket of
  * "r:" + value, EXACTLY portable_hash32's arithmetic: first 8 hex
  * chars of md5 as a long, pmod width), so the matrix is a pure
  * function of the input multiset — merge-order invariant, bit-equal
  * to the exploded-relation form, same oracle. Removes the x depth
  * explode ahead of the partial aggregation. Output: the full flat
  * matrix; readers emit the nonzero cells to match the relation. */
class CmTI(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](depth * width)

  private def bucket(r: Int, v: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(
      (r.toString + ":" + v).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % width).toInt // h is non-negative: pmod == mod
  }

  def reduce(b: Array[Long], a: String): Array[Long] = {
    if (a != null) {
      var r = 0
      while (r < depth) {
        b(r * width + bucket(r, a)) += 1L
        r += 1
      }
    }
    b
  }
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

// ------------------------------------------------------------ registration

/** Registered from PySpark through the session's ADD JAR classloader
  * (jvm/__init__.py::_register_typed): loadClass("fes.ScalaReg") + static
  * forwarder invoke — works on a vanilla driver session, no spark.jars
  * needed at startup. */
object ScalaReg {
  def registerDyadic(name: String, k: Int): Unit =
    SparkSession.active.udf.register(
      name, functions.udaf(new DyadicHistTI(k), Encoders.LONG))
  def registerDyadicW(name: String, k: Int): Unit =
    SparkSession.active.udf.register(
      name,
      functions.udaf(
        new DyadicHistWTI(k), Encoders.tuple(Encoders.LONG, Encoders.LONG)))
  def registerKmv(name: String, k: Int): Unit =
    SparkSession.active.udf.register(
      name, functions.udaf(new KmvBottomKTI(k), Encoders.LONG))
  def registerMg(name: String, k: Int): Unit =
    SparkSession.active.udf.register(
      name, functions.udaf(new MGTopKTI(k), Encoders.STRING))
  def registerHll(name: String, p: Int): Unit =
    SparkSession.active.udf.register(
      name, functions.udaf(new HllTI(p), Encoders.LONG))
  def registerKmvSample(name: String, k: Int): Unit =
    SparkSession.active.udf.register(
      name,
      functions.udaf(
        new KmvSampleBottomKTI(k),
        Encoders.tuple(Encoders.LONG, Encoders.STRING, Encoders.DOUBLE)))
  def registerCm(name: String, depth: Int, width: Int): Unit =
    SparkSession.active.udf.register(
      name, functions.udaf(new CmTI(depth, width), Encoders.STRING))
}
