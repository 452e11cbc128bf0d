package graft.ops

import org.apache.spark.{Dependency, OneToOneDependency, Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Defers a CONSTRUCTION-time physical-strategy decision to the first
  * ACTION on the returned DataFrame.
  *
  * Some operators pick their join strategy from a MEASURED row count
  * (Catalyst's size estimates cannot see a ~65x explode asymmetry, so the
  * engine counts a bounded prefix instead — see
  * [[Dedup.hammingPairs]]/[[Dedup.hammingJoin]]). Running that bounded
  * count while the caller is merely COMPOSING a pipeline is a surprise:
  * building a DataFrame should never submit cluster work. This wrapper
  * moves the decision into the action path: `build()` — which may run
  * bounded counts and returns the strategy-resolved frame — is forced on
  * the driver the first time the scheduler asks for partitions (i.e. at
  * the caller's first action), then memoized; tasks see an ordinary
  * narrow parent RDD.
  *
  * Trade-off (documented at the call sites): the returned frame's logical
  * plan is an opaque RDD scan, so downstream filters don't push into the
  * deferred subtree. The wrapped operators are terminal pair-emitters
  * whose callers consume the output as-is, and the `*Planned` variants
  * remain available for plan inspection.
  */
private[graft] object LazyPlan {

  def apply(spark: SparkSession, schema: StructType)(build: () => DataFrame): DataFrame =
    spark.createDataFrame(new LazyChoiceRdd(spark, schema, build), schema)

  private class LazyChoiceRdd(@transient spark: SparkSession,
                              schema: StructType,
                              @transient build: () => DataFrame)
      extends RDD[Row](spark.sparkContext, Nil) {
    // forced on the DRIVER at first job submission (getPartitions /
    // getDependencies), never at DataFrame construction. By the time tasks
    // serialize this RDD the dependency chain is resolved and rides along
    // as the narrow parent, so executors never touch `build`.
    @transient private lazy val target: RDD[Row] = {
      val df = build()
      require(df.schema.fields.map(f => (f.name, f.dataType)) sameElements
          schema.fields.map(f => (f.name, f.dataType)),
        s"lazy plan resolved to schema ${df.schema.simpleString}, declared ${schema.simpleString}")
      df.rdd
    }
    override protected def getPartitions: Array[Partition] = target.partitions
    override protected def getDependencies: Seq[Dependency[_]] =
      Seq(new OneToOneDependency(target))
    override def compute(split: Partition, context: TaskContext): Iterator[Row] =
      firstParent[Row].iterator(split, context)
  }
}
