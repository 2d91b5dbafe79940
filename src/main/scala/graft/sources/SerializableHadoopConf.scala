package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop Configuration, so executor
  * tasks of the byte-level file readers (Shapefile/GeoPackage) see the
  * session's configured filesystems/credentials instead of a blank
  * `new Configuration()`. Same idea as Spark's own (spark-private)
  * SerializableConfiguration.
  */
private[graft] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {

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
