package graft.functions.kernels

/** Primitive open-addressing (value → count) map over doubles, keyed by
  * `doubleToLongBits` — the aggregation buffer behind
  * [[NumericProfileAgg]]. A boxed `mutable.HashMap[Double, Long]` spent
  * most of the exact-profile kernel's per-row budget on autoboxing and
  * node allocation (measured: the q17 single-pass profile was
  * update-bound, not I/O-bound). Bits-keying preserves the boxed map's
  * equality semantics exactly: `java.lang.Double.equals` also compares
  * raw bits, so −0.0 and +0.0 stay distinct values on both paths (NaN is
  * mapped to null upstream and never enters).
  *
  * Linear probing, power-of-two capacity, growth at 7/8 load. The one
  * reserved slot trick: bits == 0L (the double +0.0) is also the empty
  * marker, so +0.0 counts live in a dedicated field instead of the
  * table. Not thread-safe (one buffer per task, the aggregate contract).
  */
object DoubleCountMap {
  private val instanceCounter = new java.util.concurrent.atomic.AtomicLong()
}

final class DoubleCountMap(initialCapacity: Int = 1 << 10) {
  // PER-INSTANCE hash seed. Without it, merging/deserializing one map
  // into another inserts keys in the SOURCE's slot order — which, under a
  // shared hash function, is home-slot-sorted order in the target too:
  // every insert packs a dense run the next inserts must traverse, and
  // the merge goes quadratic (measured: a healthy 1.8M-insert column
  // profile spent 16.9e9 probes — ~3,000/insert — in the final-stage
  // merges; with de-correlated seeds it is ~3/insert). The seed only
  // changes slot layout, never contents — results are order-free (eval
  // sorts) and counts are exact either way.
  private val seed = {
    var z = DoubleCountMap.instanceCounter.incrementAndGet() *
      -7046029254386353131L
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) - 1) << 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = 0
  private var zeroCount = 0L // count for bits == 0L (+0.0)

  def size: Int = used + (if (zeroCount > 0) 1 else 0)

  def addBits(bits: Long, c: Long): Unit = {
    if (bits == 0L) { zeroCount += c; return }
    // fmix64 (MurmurHash3 finalizer) over the seeded key: full avalanche
    // before masking
    var h = bits ^ seed
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    var i = (h & (cap - 1)).toInt
    while (true) {
      val k = keys(i)
      if (k == bits) { vals(i) += c; return }
      if (k == 0L) {
        keys(i) = bits; vals(i) = c
        used += 1
        if (used * 8L >= cap * 7L) grow()
        return
      }
      i = (i + 1) & (cap - 1)
    }
  }

  def add(v: Double, c: Long): Unit =
    addBits(java.lang.Double.doubleToLongBits(v), c)

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    used = 0
    val zc = zeroCount; zeroCount = 0L
    var i = 0
    while (i < ok.length) {
      if (ok(i) != 0L) addBits(ok(i), ov(i))
      i += 1
    }
    zeroCount = zc
  }

  /** (value, count) entries sorted ascending by value. */
  def sortedEntries(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var j = 0
    if (zeroCount > 0) { out(j) = (0.0, zeroCount); j += 1 }
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) {
        out(j) = (java.lang.Double.longBitsToDouble(keys(i)), vals(i))
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(out, Ordering.by[(Double, Long), Double](_._1))
    out
  }

  /** Visit every (bits, count) pair, order unspecified. */
  def foreachBits(f: (Long, Long) => Unit): Unit = {
    if (zeroCount > 0) f(0L, zeroCount)
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) f(keys(i), vals(i))
      i += 1
    }
  }
}
