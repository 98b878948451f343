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
 * A single-slot victim cache (the standard Fan et al. construction) catches
 * the homeless fingerprint when an insert exhausts MaxKicks, so a failed
 * insert can never evict a previously-inserted key (the no-false-negative
 * guarantee survives overload). Serialized bytes start with the "CUKF"
 * magic tag ([[SeenBloom]] uses "BLMF") so checkpoint manifests can carry
 * either filter type unambiguously.
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
  // single-slot victim cache (Fan et al. §4): holds the homeless fingerprint
  // of an insert that exhausted MaxKicks, so no resident key is ever lost
  private var victimUsed = false
  private var victimFp = 0
  private var victimBucket = 0

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

  /** Insert; false only when the filter (including the victim slot) is too
    * loaded to accept anything — in that case NO state changes, so resident
    * keys are never lost. */
  def put(key: String): Boolean = {
    val h = hashKey(key)
    val fp = fingerprint(h)
    insertCore(bucketOf(h), fp)
  }

  private def insertCore(i1: Int, fp: Int): Boolean = {
    val i2 = altBucket(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) { count += 1; return true }
    // both buckets full: kicking will displace residents, and an exhausted
    // kick chain parks the homeless fingerprint in the victim slot. If that
    // slot is occupied we must refuse UP FRONT (no state change).
    if (victimUsed) return false
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
    // park the homeless resident; the new key was installed during kicking
    victimUsed = true; victimFp = f; victimBucket = b
    count += 1
    true
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
    victimUsed && victimFp == fp.toInt && (victimBucket == i1 || victimBucket == i2)
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
    if (victimUsed && victimFp == fp.toInt && (victimBucket == i1 || victimBucket == i2)) {
      victimUsed = false; victimFp = 0; victimBucket = 0
      count -= 1
      return true
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
        if (fp != 0) ok = insertCore(b, fp)
        s += 1
      }
      b += 1
    }
    if (ok && other.victimUsed) ok = insertCore(other.victimBucket, other.victimFp)
    ok
  }

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(CuckooFilter.Magic)
    dos.writeInt(numBuckets); dos.writeInt(fpBits); dos.writeLong(count)
    dos.writeBoolean(victimUsed); dos.writeInt(victimFp); dos.writeInt(victimBucket)
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

  /** Format tag ("CUKF") distinguishing cuckoo bytes from SeenBloom bytes
    * in manifests that may carry either. */
  val Magic: Int = 0x43554B46

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = dis.readInt()
    require(magic == Magic, f"not a CuckooFilter byte stream (tag 0x$magic%08X)")
    val numBuckets = dis.readInt(); val fpBits = dis.readInt(); val count = dis.readLong()
    val vUsed = dis.readBoolean(); val vFp = dis.readInt(); val vBucket = dis.readInt()
    val cf = new CuckooFilter(numBuckets, fpBits)
    def set(name: String, f: java.lang.reflect.Field => Unit): Unit = {
      val fld = classOf[CuckooFilter].getDeclaredField(name)
      fld.setAccessible(true); f(fld)
    }
    set("table", f => {
      val table = f.get(cf).asInstanceOf[Array[Char]]
      var i = 0
      while (i < table.length) { table(i) = dis.readChar(); i += 1 }
    })
    set("count", _.setLong(cf, count))
    set("victimUsed", _.setBoolean(cf, vUsed))
    set("victimFp", _.setInt(cf, vFp))
    set("victimBucket", _.setInt(cf, vBucket))
    cf
  }
}
