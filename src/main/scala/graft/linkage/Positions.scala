package graft.linkage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable global position assignment (W2 semantics, reference
  * households.py:190–193 / linkid_to_patid.py:84–90).
  *
  * `row_number().over(Window.orderBy(k))` moves EVERY row to one
  * partition — fine for the reference's single process, a scale-killer on
  * a cluster (round 1 used it at four output edges; the "Moving all data
  * to a single partition" WARN was visible in the bench tail).
  *
  * Scale-safe equivalent with identical output for a total order:
  * range-partition by the key, sort within partitions, take the
  * per-partition consecutive counter from monotonically_increasing_id
  * (partition id in the upper bits, a 0-based consecutive counter in the
  * low 33), then add per-partition offsets — the only driver-side data is
  * one row count per shuffle partition.
  */
object Positions {

  private val MonoCounterMask = (1L << 33) - 1

  /** Adds 0-based `posCol` dense positions in ascending `order`, equal to
    * `row_number().over(Window.orderBy(order)) - 1`. `order` must be a
    * total order (unique key) for the result to be well-defined — the
    * same requirement the reference's positional files have. */
  def withPosition(df: DataFrame, order: Column, posCol: String): DataFrame = {
    val spark = df.sparkSession
    // persist BEFORE the counts action: the counts job materializes the
    // cache, so the consumption job sees the exact same partitions and
    // the same (nondeterministic-flagged) monotonic ids
    val arranged = df
      .repartitionByRange(order)
      .sortWithinPartitions(order)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mono", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = arranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }
    val offsetRows = counts.map(_._1).zip(offsets.map(_._2))
    import spark.implicits._
    val offsetsDf = offsetRows.toSeq.toDF("_pid", "_offset")
    arranged
      .join(broadcast(offsetsDf), Seq("_pid"))
      .withColumn(posCol,
        col("_offset") + col("_mono").bitwiseAND(lit(MonoCounterMask)))
      .drop("_pid", "_mono", "_offset")
  }
}
