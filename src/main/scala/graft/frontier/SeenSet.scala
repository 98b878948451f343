package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * The URL-seen set (SURVEY §2.3 J2 / §2.4 A8): a bloom-filter pre-filter in
 * front of an exact left-anti join.
 *
 * Shape at scale: the exact set lives as an append-only parquet table of
 * `(jobId, urlNorm)` keyed rows (one directory per generation — never
 * rewritten, O(new) write cost per superstep). The bloom filter is built
 * per-partition and merged via Spark's internal `treeAggregate`-backed
 * `DataFrameStatFunctions.bloomFilter`, held on the driver across
 * generations with `mergeInPlace`, and broadcast into the candidate filter
 * each superstep.
 *
 * Effect: ≥99% of duplicate links are killed *before* the shuffle of the
 * exact anti-join; only bloom-positives (true dups + fpp false positives)
 * shuffle against the seen table. A bloom filter has NO false negatives, so
 * `!mightContain => definitely new` is exact (property-tested).
 *
 * At 10^10 keys / 1% fpp a single filter is ~12 GB — too big to broadcast;
 * the `shards` knob splits the key space by `hash(key) % shards` so each
 * broadcast piece stays executor-friendly, at identical semantics.
 */
final class SeenBloom(val shards: Int, expectedPerShard: Long, fpp: Double) extends Serializable {
  val filters: Array[BloomFilter] =
    Array.fill(shards)(BloomFilter.create(expectedPerShard, fpp))

  private def shardOf(key: String): Int = {
    val h = key.hashCode
    ((h % shards) + shards) % shards
  }

  def put(key: String): Unit = filters(shardOf(key)).putString(key)
  def mightContain(key: String): Boolean = filters(shardOf(key)).mightContainString(key)

  def mergeFrom(other: SeenBloom): Unit = {
    require(other.shards == shards)
    var i = 0
    while (i < shards) { filters(i).mergeInPlace(other.filters(i)); i += 1 }
  }

  def serialized: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(shards)
    filters.foreach { f =>
      val b = new ByteArrayOutputStream()
      f.writeTo(b)
      val arr = b.toByteArray
      dos.writeInt(arr.length)
      dos.write(arr)
    }
    dos.flush()
    bos.toByteArray
  }
}

object SeenBloom {
  def deserialize(bytes: Array[Byte]): SeenBloom = {
    val dis = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val shards = dis.readInt()
    val sb = new SeenBloom(shards, 1L, 0.5) // placeholder filters, replaced below
    var i = 0
    while (i < shards) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      sb.filters(i) = BloomFilter.readFrom(new ByteArrayInputStream(arr))
      i += 1
    }
    sb
  }

  /** One-pass (bloom, per-job counts) build over (jobId, urlNorm) rows —
    * collapses the engine's separate count job and bloom job into a single
    * treeAggregate (superstep fixed latency bounds scaling efficiency). */
  def fromJobKeys(df: DataFrame, jobCol: String, keyCol: String,
      shards: Int, expectedPerShard: Long, fpp: Double): (SeenBloom, Map[String, Long]) = {
    val (bloom, counts) = df.select(jobCol, keyCol).na.drop().rdd
      .map(r => (r.getString(0), r.getString(0) + "-" + r.getString(1)))
      .treeAggregate((new SeenBloom(shards, expectedPerShard, fpp),
          scala.collection.mutable.Map[String, Long]()))(
        seqOp = { case ((b, m), (job, key)) =>
          b.put(key); m(job) = m.getOrElse(job, 0L) + 1L; (b, m)
        },
        combOp = { case ((b1, m1), (b2, m2)) =>
          b1.mergeFrom(b2)
          m2.foreach { case (j, n) => m1(j) = m1.getOrElse(j, 0L) + n }
          (b1, m1)
        })
    (bloom, counts.toMap)
  }

  /** Build a SeenBloom from a column of keys, distributed (uses Spark's
    * aggregate-based bloom builder per shard-partition, merged on driver). */
  def fromKeys(df: DataFrame, col: String, shards: Int, expectedPerShard: Long, fpp: Double): SeenBloom = {
    val sb = new SeenBloom(shards, expectedPerShard, fpp)
    // One pass: per-partition local blooms, merged via treeAggregate.
    val merged = df.select(col).na.drop().rdd
      .map(_.getString(0))
      .treeAggregate(new SeenBloom(shards, expectedPerShard, fpp))(
        seqOp = (acc, key) => { acc.put(key); acc },
        combOp = (a, b) => { a.mergeFrom(b); a })
    sb.mergeFrom(merged)
    sb
  }
}
