package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Typed Aggregator building a Bloom sketch over a Long key column —
  * the `treeAggregate(BloomFilter)` pattern as a first-class Spark
  * aggregate (usable in `agg(...)`, grouped or global, partial
  * aggregation map-side for free). Alternative to
  * DataFrameStatFunctions.bloomFilter when the sketch should compose
  * inside a larger aggregation.
  */
class BloomSketchAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, key: Long): BloomFilter = {
    b.putLong(key)
    b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def finish(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomSketchAgg {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
