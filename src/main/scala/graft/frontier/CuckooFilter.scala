package graft.frontier

/**
 * Cuckoo filter — the deletion-capable fallback for the URL-seen set that the
 * north rule names next to the bloom filter (SURVEY §2.4 A8 / §7.3).
 *
 * Why it exists: a bloom filter cannot forget. Two crawl situations need
 * deletions from the approximate seen-set: (a) re-crawl policies that expire
 * URLs after a TTL so they become schedulable again, and (b) rolling back a
 * partially-failed generation without rebuilding the filter from the exact
 * parquet set. A cuckoo filter supports O(1) delete of a previously-inserted
 * key while keeping bloom-like space (~1 byte/key at 3% fpp with 8-bit
 * fingerprints) and the same no-false-negative guarantee for present keys.
 *
 * Design (standard public construction, Fan et al., CoNLX'14 "Cuckoo Filter:
 * Practically Better Than Bloom"):
 *  - `buckets` of 4 fingerprint slots each (fingerprint = 8..16 bits, never 0)
 *  - key -> (i1 = hash(key), i2 = i1 XOR hash(fp)) — partial-key cuckoo
 *    hashing lets i2 be computed from (i1, fp) alone
 *  - insert kicks a random resident on bucket overflow, up to `MaxKicks`
 *  - sharding/merge mirror [[SeenBloom]] so the engine can swap implementations
 *    (merge = re-insert of the other filter's fingerprints; a cuckoo filter
 *    has no lossless union, so mergeFrom can fail at very high load — callers
 *    size shards exactly as for blooms).
 *
 * Serialization matches SeenBloom's framing so checkpoint manifests can carry
 * either.
 */
final class CuckooFilter(val numBuckets: Int, val fpBits: Int = 12,
    seed: Long = 0x5EED5EEDL) extends Serializable {
  require((numBuckets & (numBuckets - 1)) == 0, "numBuckets must be a power of two")
  require(fpBits >= 4 && fpBits <= 16)

  private val SlotsPerBucket = 4
  private val MaxKicks = 500
  private val fpMask = (1 << fpBits) - 1
  // slot storage: char (16-bit) per slot; 0 = empty
  private val table = new Array[Char](numBuckets * SlotsPerBucket)
  private var count = 0L
  // deterministic kick sequence (no Random: reproducible across runs)
  private var kickState: Long = seed

  def size: Long = count

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def hashKey(key: String): Long = {
    var h = seed
    var i = 0
    while (i < key.length) { h = mix(h ^ key.charAt(i).toLong); i += 1 }
    h
  }

  /** Fingerprint in [1, fpMask] (0 is the empty marker). */
  private def fingerprint(h: Long): Int = {
    val fp = ((h >>> 32).toInt & fpMask)
    if (fp == 0) 1 else fp
  }

  private def bucketOf(h: Long): Int = (h & (numBuckets - 1)).toInt

  private def altBucket(i: Int, fp: Int): Int =
    (i ^ bucketOf(mix(fp.toLong))) & (numBuckets - 1)

  private def slotBase(b: Int): Int = b * SlotsPerBucket

  private def tryInsertAt(b: Int, fp: Int): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp.toChar; return true }
      s += 1
    }
    false
  }

  /** Insert; false when the filter is too loaded (caller should grow/shard). */
  def put(key: String): Boolean = {
    val h = hashKey(key)
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    val i2 = altBucket(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) { count += 1; return true }
    // cuckoo kicking
    var b = if ((mix(kickState) & 1L) == 0L) i1 else i2
    var f = fp
    var n = 0
    while (n < MaxKicks) {
      kickState = mix(kickState)
      val s = ((kickState >>> 8) % SlotsPerBucket).toInt.abs
      val base = slotBase(b)
      val evicted = table(base + s).toInt
      table(base + s) = f.toChar
      f = evicted
      b = altBucket(b, f)
      if (tryInsertAt(b, f)) { count += 1; return true }
      n += 1
    }
    // restore not possible without history; filter is over-loaded
    false
  }

  def mightContain(key: String): Boolean = {
    val h = hashKey(key)
    val fp = fingerprint(h).toChar
    val i1 = bucketOf(h)
    val i2 = altBucket(i1, fp)
    val b1 = slotBase(i1); val b2 = slotBase(i2)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b1 + s) == fp || table(b2 + s) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one occurrence of a previously-inserted key. Returns whether a
    * fingerprint was removed. (Deleting a never-inserted key may remove a
    * colliding fingerprint — the standard cuckoo-filter caveat; callers
    * delete only keys they know were inserted, e.g. TTL-expired seen URLs.) */
  def delete(key: String): Boolean = {
    val h = hashKey(key)
    val fp = fingerprint(h).toChar
    val i1 = bucketOf(h)
    val i2 = altBucket(i1, fp)
    var b = slotBase(i1)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b + s) == fp) { table(b + s) = 0; count -= 1; return true }
      s += 1
    }
    b = slotBase(i2)
    s = 0
    while (s < SlotsPerBucket) {
      if (table(b + s) == fp) { table(b + s) = 0; count -= 1; return true }
      s += 1
    }
    false
  }

  /** Merge = re-insert every resident fingerprint of `other` (same geometry).
    * False when load forces a failed insert. */
  def mergeFrom(other: CuckooFilter): Boolean = {
    require(other.numBuckets == numBuckets && other.fpBits == fpBits)
    var b = 0
    var ok = true
    while (b < other.numBuckets && ok) {
      val base = other.slotBase(b)
      var s = 0
      while (s < SlotsPerBucket && ok) {
        val fp = other.table(base + s).toInt
        if (fp != 0) ok = insertFingerprint(b, fp)
        s += 1
      }
      b += 1
    }
    ok
  }

  private def insertFingerprint(origin: Int, fp: Int): Boolean = {
    if (tryInsertAt(origin, fp) || tryInsertAt(altBucket(origin, fp), fp)) { count += 1; true }
    else {
      var b = origin
      var f = fp
      var n = 0
      while (n < MaxKicks) {
        kickState = mix(kickState)
        val s = ((kickState >>> 8) % SlotsPerBucket).toInt.abs
        val base = slotBase(b)
        val evicted = table(base + s).toInt
        table(base + s) = f.toChar
        f = evicted
        b = altBucket(b, f)
        if (tryInsertAt(b, f)) { count += 1; return true }
        n += 1
      }
      false
    }
  }

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(numBuckets); dos.writeInt(fpBits); dos.writeLong(count)
    var i = 0
    while (i < table.length) { dos.writeChar(table(i)); i += 1 }
    dos.flush()
    bos.toByteArray
  }
}

object CuckooFilter {
  /** Geometry for `expected` keys at ~95% max load with 4-slot buckets. */
  def forCapacity(expected: Long, fpBits: Int = 12): CuckooFilter = {
    val slotsNeeded = math.max(16L, (expected / 0.95).toLong)
    var buckets = 4L
    while (buckets * 4 < slotsNeeded) buckets <<= 1
    new CuckooFilter(buckets.toInt, fpBits)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val numBuckets = dis.readInt(); val fpBits = dis.readInt(); val count = dis.readLong()
    val cf = new CuckooFilter(numBuckets, fpBits)
    val field = classOf[CuckooFilter].getDeclaredField("table")
    field.setAccessible(true)
    val table = field.get(cf).asInstanceOf[Array[Char]]
    var i = 0
    while (i < table.length) { table(i) = dis.readChar(); i += 1 }
    val cnt = classOf[CuckooFilter].getDeclaredField("count")
    cnt.setAccessible(true)
    cnt.setLong(cf, count)
    cf
  }
}
