package graft.core

import org.apache.hadoop.conf.Configuration

/**
 * A Java-serializable wrapper for a Hadoop [[Configuration]] (which is a
 * Hadoop `Writable` but not `java.io.Serializable`), so the SESSION conf —
 * `spark.hadoop.*` overlays, fs credentials, `fs.defaultFS` — can ride a
 * Spark broadcast into executor tasks. Spark's own
 * `org.apache.spark.util.SerializableConfiguration` is `private[spark]` at
 * the Scala level, hence this ~10-line equivalent.
 */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
